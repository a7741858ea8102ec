// Per-op cross-check driver for the two reference components not
// exercised by the CDemodulator chain harness: the fractional resampler
// (dsp/fractresampler.cpp — 28-period BH sinc table, truncating lookup,
// float-time accumulator) and the impulse noise blanker
// (dsp/noiseproc.cpp — 5 ms mag average, Width/2 delay, countdown blank).
// Their float64 outputs get pinned as fixtures so our ops/resampler and
// ops/noiseblanker are asserted against the reference binary itself.
//
// Usage:
//   refmisc resamp  <iq.f64> <rate> <chunk> <out_prefix>
//       rate = input_rate / output_rate; feeds <chunk>-sample blocks
//   refmisc blanker <iq.f64> <threshold> <width_us> <fs> <out_prefix>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "gui/testbench.h"
#include "dsp/fractresampler.h"
#include "dsp/noiseproc.h"

CTestBench* g_pTestBench = new CTestBench();

static std::vector<double> read_f64(const char* path)
{
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<double> v(bytes / sizeof(double));
    if (fread(v.data(), sizeof(double), v.size(), f) != v.size()) exit(2);
    fclose(f);
    return v;
}

static void write_cpx(const char* prefix, const std::vector<TYPECPX>& v)
{
    char path[1024];
    snprintf(path, sizeof path, "%s.out.f64", prefix);
    FILE* f = fopen(path, "wb");
    for (size_t i = 0; i < v.size(); i++) {
        fwrite(&v[i].re, sizeof(double), 1, f);
        fwrite(&v[i].im, sizeof(double), 1, f);
    }
    fclose(f);
}

int main(int argc, char** argv)
{
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "resamp") && argc == 6) {
        std::vector<double> raw = read_f64(argv[2]);
        double rate = atof(argv[3]);
        int chunk = atoi(argv[4]);
        int n = (int)(raw.size() / 2);
        std::vector<TYPECPX> in(n), outbuf(2 * chunk + 64), all;
        for (int i = 0; i < n; i++) { in[i].re = raw[2*i]; in[i].im = raw[2*i+1]; }
        CFractResampler rs;
        rs.Init(chunk);
        for (int pos = 0; pos + chunk <= n; pos += chunk) {
            int got = rs.Resample(chunk, rate, in.data() + pos, outbuf.data());
            for (int i = 0; i < got; i++) all.push_back(outbuf[i]);
        }
        write_cpx(argv[5], all);
        printf("resamp out=%zu\n", all.size());
        return 0;
    }
    if (!strcmp(argv[1], "blanker") && argc == 7) {
        std::vector<double> raw = read_f64(argv[2]);
        double thresh = atof(argv[3]);
        double width = atof(argv[4]);
        double fs = atof(argv[5]);
        int n = (int)(raw.size() / 2);
        std::vector<TYPECPX> in(n), out(n), all;
        for (int i = 0; i < n; i++) { in[i].re = raw[2*i]; in[i].im = raw[2*i+1]; }
        CNoiseProc nb;
        nb.SetupBlanker(true, thresh, width, fs);
        const int CHUNK = 2048;
        for (int pos = 0; pos < n; pos += CHUNK) {
            int len = (pos + CHUNK <= n) ? CHUNK : (n - pos);
            nb.ProcessBlanker(len, in.data() + pos, out.data() + pos);
        }
        all.assign(out.begin(), out.end());
        write_cpx(argv[6], all);
        printf("blanker out=%zu\n", all.size());
        return 0;
    }
    fprintf(stderr, "usage: %s resamp iq.f64 rate chunk out_prefix | "
                    "blanker iq.f64 threshold width_us fs out_prefix\n",
            argv[0]);
    return 1;
}
