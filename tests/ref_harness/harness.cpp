// Out-of-tree driver for the REFERENCE DSP chain (VERDICT r3 item 2).
//
// Compiles /root/reference/dsp/*.cpp unmodified (Qt satisfied by the stub
// headers in stubs/) and drives the real CDemodulator --
// CDownConvert -> CFastFIR -> CSMeter -> CAgc -> C{Am,Sam,Fm,Ssb}Demod
// (dsp/demodulator.cpp:163-215) -- with fixture IQ, dumping the float64
// audio plus the P1/P2/P3 intermediate taps the chain publishes through
// g_pTestBench (dsp/demodulator.cpp:175,180,187).
//
// The dumps are committed as DATA fixtures (tests/fixtures/refgold_*.npz);
// no reference code enters the package.  This closes the oracle loop: our
// framework is asserted against the reference's own compiled output, not
// only against re-derived f64 oracles.
//
// Usage:
//   refchain <iq.f64> <fs> <nco_freq> <mode 0..6> <lowcut> <hicut>
//            <cw_offset> <agc_on> <agc_thresh> <agc_decay> <out_prefix>
// iq.f64 = interleaved re,im float64.  Writes <out_prefix>.audio.f64 and
// <out_prefix>.p{1,2,3}.f64 (interleaved complex), plus a .meta.txt with
// the output rate CDownConvert::SetDataRate selected.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "gui/testbench.h"
#include "dsp/demodulator.h"

CTestBench* g_pTestBench = new CTestBench();

static std::vector<double> read_f64(const char* path)
{
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<double> v(bytes / sizeof(double));
    if (fread(v.data(), sizeof(double), v.size(), f) != v.size()) {
        fprintf(stderr, "short read on %s\n", path); exit(2);
    }
    fclose(f);
    return v;
}

static void write_f64(const char* prefix, const char* tag,
                      const std::vector<double>& v)
{
    char path[1024];
    snprintf(path, sizeof path, "%s.%s.f64", prefix, tag);
    FILE* f = fopen(path, "wb");
    if (!f) { fprintf(stderr, "cannot write %s\n", path); exit(2); }
    fwrite(v.data(), sizeof(double), v.size(), f);
    fclose(f);
}

int main(int argc, char** argv)
{
    if (argc != 12 && argc != 13) {
        fprintf(stderr, "usage: %s iq.f64 fs nco_freq mode lowcut hicut "
                        "cw_offset agc_on agc_thresh agc_decay out_prefix "
                        "[stereo]\n",
                argv[0]);
        return 1;
    }
    bool stereo = (argc == 13) && atoi(argv[12]) != 0;
    const char* iq_path = argv[1];
    double fs = atof(argv[2]);
    double nco_freq = atof(argv[3]);
    int mode = atoi(argv[4]);
    int lowcut = atoi(argv[5]);
    int hicut = atoi(argv[6]);
    int cw_offset = atoi(argv[7]);
    bool agc_on = atoi(argv[8]) != 0;
    int agc_thresh = atoi(argv[9]);
    int agc_decay = atoi(argv[10]);
    const char* out_prefix = argv[11];

    for (int p = PROFILE_1; p <= PROFILE_4; p++)
        g_pTestBench->capture_enabled[p] = true;

    // tDemodInfo mirrors the per-mode defaults/limits table the GUI feeds
    // SetDemod (gui/mainwindow.cpp:1000-1054); the limits drive the
    // decimation target (demodulator.cpp:116-119).
    tDemodInfo info;
    memset(&info, 0, sizeof(tDemodInfo));
    info.HiCut = hicut;
    info.LowCut = lowcut;
    switch (mode) {                       // HiCutmax / LowCutmin per mode
        case DEMOD_AM:  info.HiCutmax = 10000; info.LowCutmin = -10000; break;
        case DEMOD_SAM: info.HiCutmax = 10000; info.LowCutmin = -10000; break;
        case DEMOD_FM:  info.HiCutmax = 15000; info.LowCutmin = -15000; break;
        case DEMOD_USB: info.HiCutmax = 20000; info.LowCutmin = 0;      break;
        case DEMOD_LSB: info.HiCutmax = 0;     info.LowCutmin = -20000; break;
        case DEMOD_CWU: info.HiCutmax = 1000;  info.LowCutmin = -1000;  break;
        case DEMOD_CWL: info.HiCutmax = 1000;  info.LowCutmin = -1000;  break;
        default: fprintf(stderr, "bad mode %d\n", mode); return 1;
    }
    info.Offset = cw_offset;
    info.SquelchValue = 0;
    info.AgcSlope = 0;
    info.AgcThresh = agc_thresh;
    info.AgcManualGain = 30;
    info.AgcDecay = agc_decay;
    info.AgcOn = agc_on;
    info.AgcHangOn = false;

    CDemodulator demod;
    demod.SetInputSampleRate(fs);
    demod.SetDemod(mode, info);
    demod.SetDemodFreq(nco_freq);

    std::vector<double> iq = read_f64(iq_path);
    int n = (int)(iq.size() / 2);
    std::vector<TYPECPX> in(n);
    for (int i = 0; i < n; i++) {
        in[i].re = iq[2 * i];
        in[i].im = iq[2 * i + 1];
    }

    std::vector<TYPEREAL> audio(n + 16);
    std::vector<TYPECPX> audio_st(n + 16);
    std::vector<double> all_audio;   // stereo: interleaved left,right
    // feed in modest chunks like the radio does (240/342-sample packets,
    // interface/netiobase.cpp:59-60); CDemodulator buffers internally
    const int CHUNK = 2048;
    for (int pos = 0; pos < n; pos += CHUNK) {
        int len = (pos + CHUNK <= n) ? CHUNK : (n - pos);
        if (stereo) {
            // the stereo overload (dsp/demodulator.cpp:221-273); SAM
            // emits LSB->left (re), USB->right (im)
            int got = demod.ProcessData(len, in.data() + pos,
                                        audio_st.data());
            for (int i = 0; i < got; i++) {
                all_audio.push_back(audio_st[i].re);
                all_audio.push_back(audio_st[i].im);
            }
        } else {
            int got = demod.ProcessData(len, in.data() + pos, audio.data());
            for (int i = 0; i < got; i++)
                all_audio.push_back(audio[i]);
        }
    }

    write_f64(out_prefix, "audio", all_audio);
    write_f64(out_prefix, "p1", g_pTestBench->captured[PROFILE_1]);
    write_f64(out_prefix, "p2", g_pTestBench->captured[PROFILE_2]);
    write_f64(out_prefix, "p3", g_pTestBench->captured[PROFILE_3]);

    char path[1024];
    snprintf(path, sizeof path, "%s.meta.txt", out_prefix);
    FILE* f = fopen(path, "w");
    fprintf(f, "output_rate %.17g\naudio_samples %zu\n",
            demod.GetOutputRate(), all_audio.size());
    fclose(f);
    printf("output_rate=%.6f audio=%zu p1=%zu\n", demod.GetOutputRate(),
           all_audio.size(), g_pTestBench->captured[PROFILE_1].size() / 2);
    return 0;
}
