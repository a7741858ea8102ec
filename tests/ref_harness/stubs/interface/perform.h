// Stub for interface/perform.h: the DSP sources include it but every
// Start/StopPerformance call site is commented out, so declarations alone
// satisfy the compiler (and nothing references the symbols at link time).
#ifndef PERFORM_STUB_H
#define PERFORM_STUB_H
extern void InitPerformance();
extern void StartPerformance();
extern void StopPerformance(int n);
extern void ReadPerformance();
#endif
