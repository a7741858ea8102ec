// Stub gui/testbench.h: the reference DSP calls the global g_pTestBench
// probe scope at fixed pipeline taps (dsp/demodulator.cpp:175-208 etc.).
// This stand-in CAPTURES those taps into per-profile buffers instead of
// rendering them, turning the reference's visual instrument into a data
// recorder for the golden cross-check.  Same PROFILE_x ids as the real
// gui/testbench.h:29-38.
#ifndef TESTBENCH_STUB_H
#define TESTBENCH_STUB_H

#include <vector>
#include <QString>
#include "dsp/datatypes.h"

#define PROFILE_OFF 0
#define PROFILE_1 1
#define PROFILE_2 2
#define PROFILE_3 3
#define PROFILE_4 4
#define PROFILE_5 5
#define PROFILE_6 6
#define PROFILE_7 7
#define NUM_PROFILES 8

class CTestBench
{
public:
    CTestBench() {}

    // interleaved re,im per complex sample; re-only for real taps
    std::vector<double> captured[NUM_PROFILES];
    bool capture_enabled[NUM_PROFILES] = {};

    void DisplayData(int n, TYPECPX* pBuf, double, int profile)
    {
        if (!capture_enabled[profile]) return;
        std::vector<double>& v = captured[profile];
        for (int i = 0; i < n; i++) {
            v.push_back(pBuf[i].re);
            v.push_back(pBuf[i].im);
        }
    }
    void DisplayData(int n, TYPEREAL* pBuf, double, int profile)
    {
        if (!capture_enabled[profile]) return;
        std::vector<double>& v = captured[profile];
        for (int i = 0; i < n; i++)
            v.push_back(pBuf[i]);
    }
    void DisplayData(int n, TYPEMONO16* pBuf, double, int profile)
    {
        if (!capture_enabled[profile]) return;
        std::vector<double>& v = captured[profile];
        for (int i = 0; i < n; i++)
            v.push_back((double)pBuf[i]);
    }
    void DisplayData(int n, TYPESTEREO16* pBuf, double, int profile)
    {
        if (!capture_enabled[profile]) return;
        std::vector<double>& v = captured[profile];
        for (int i = 0; i < n; i++) {
            v.push_back((double)pBuf[i].re);
            v.push_back((double)pBuf[i].im);
        }
    }
    void SendDebugTxt(QString) {}
};

extern CTestBench* g_pTestBench;

#endif // TESTBENCH_STUB_H
