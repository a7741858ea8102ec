// Display-FFT cross-check driver: drives the REFERENCE's CFft display
// path — Hann window + power averaging fused in the radix-4 FFT
// (dsp/fft.cpp:465-502, :560-589), K_B/K_C dB calibration (:170-188),
// I/Q-swap quirk (:275-281), and the bin->pixel max-hold screen mapping
// (GetScreenIntegerFFTData, :308-410) — with fixture IQ, dumping both the
// averaged 0.1-dB spectrum buffer and the integer pixel map so the
// framework's un-fused display path (cutesdr_tpu/pipeline/spectrum.py)
// can be asserted against the reference binary itself.
//
// Usage:
//   reffft <iq.f64> <fft_size> <ave> <dbcomp> <fs>
//          <maxdb> <mindb> <width> <height> <out_prefix>
// iq.f64 = interleaved re,im float64, a whole number of fft_size frames.
// Writes <out_prefix>.pix.i32 (int32 pixel heights, width+... entries)
// and <out_prefix>.meta.txt.

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "gui/testbench.h"
#include "dsp/fft.h"

CTestBench* g_pTestBench = new CTestBench();

int main(int argc, char** argv)
{
    if (argc != 11) {
        fprintf(stderr, "usage: %s iq.f64 fft_size ave dbcomp fs maxdb "
                        "mindb width height out_prefix\n", argv[0]);
        return 1;
    }
    const char* iq_path = argv[1];
    int size = atoi(argv[2]);
    int ave = atoi(argv[3]);
    double dbcomp = atof(argv[4]);
    double fs = atof(argv[5]);
    double maxdb = atof(argv[6]);
    double mindb = atof(argv[7]);
    int width = atoi(argv[8]);
    int height = atoi(argv[9]);
    const char* out_prefix = argv[10];

    FILE* f = fopen(iq_path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", iq_path); return 2; }
    fseek(f, 0, SEEK_END);
    long ns = ftell(f) / (2 * (long)sizeof(double));
    fseek(f, 0, SEEK_SET);
    std::vector<double> raw(2 * ns);
    if (fread(raw.data(), sizeof(double), raw.size(), f) != raw.size())
        return 2;
    fclose(f);

    CFft fft;
    fft.SetFFTParams(size, false, dbcomp, fs);
    fft.SetFFTAve(ave);

    std::vector<TYPECPX> frame(size);
    long frames = ns / size;
    for (long fr = 0; fr < frames; fr++) {
        for (int i = 0; i < size; i++) {
            frame[i].re = raw[2 * (fr * size + i)];
            frame[i].im = raw[2 * (fr * size + i) + 1];
        }
        fft.PutInDisplayFFT(size, frame.data());
    }

    std::vector<qint32> pix(width + 2, 0);
    bool overload = fft.GetScreenIntegerFFTData(
        height, width, maxdb, mindb,
        (qint32)(-fs / 2.0), (qint32)(fs / 2.0), pix.data());

    char path[1024];
    snprintf(path, sizeof path, "%s.pix.i32", out_prefix);
    FILE* o = fopen(path, "wb");
    fwrite(pix.data(), sizeof(qint32), width, o);
    fclose(o);
    snprintf(path, sizeof path, "%s.meta.txt", out_prefix);
    o = fopen(path, "w");
    fprintf(o, "frames %ld\noverload %d\n", frames, overload ? 1 : 0);
    fclose(o);
    printf("frames=%ld overload=%d\n", frames, overload ? 1 : 0);
    return 0;
}
