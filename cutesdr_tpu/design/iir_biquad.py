"""RBJ-style biquad coefficient design (direct form 2).

Analog prototypes H(s) for LP / HP / BP / notch discretized with the standard
bilinear-style alpha substitution; everything pre-scaled by 1/a0.
(reference: dsp/iir.cpp:86-165; runtime recurrence is ops/iir.py.)

Returns (b0, b1, b2, a1, a2) float64 with the a-terms sign convention
  w0 = x - a1*w1 - a2*w2 ; y = b0*w0 + b1*w1 + b2*w2.
"""

from __future__ import annotations

import numpy as np

from cutesdr_tpu.types import K_2PI

Biquad = tuple[float, float, float, float, float]


def _wa(f0: float, q: float, fs: float) -> tuple[float, float, float]:
    w0 = K_2PI * f0 / fs
    alpha = np.sin(w0) / (2.0 * q)
    return w0, alpha, 1.0 / (1.0 + alpha)


def biquad_lowpass(f0: float, q: float, fs: float) -> Biquad:
    w0, alpha, A = _wa(f0, q, fs)
    c = np.cos(w0)
    return (A * (1 - c) / 2, A * (1 - c), A * (1 - c) / 2,
            A * (-2 * c), A * (1 - alpha))


def biquad_highpass(f0: float, q: float, fs: float) -> Biquad:
    w0, alpha, A = _wa(f0, q, fs)
    c = np.cos(w0)
    return (A * (1 + c) / 2, -A * (1 + c), A * (1 + c) / 2,
            A * (-2 * c), A * (1 - alpha))


def biquad_bandpass(f0: float, q: float, fs: float) -> Biquad:
    w0, alpha, A = _wa(f0, q, fs)
    c = np.cos(w0)
    return (A * alpha, 0.0, -A * alpha, A * (-2 * c), A * (1 - alpha))


def biquad_notch(f0: float, q: float, fs: float) -> Biquad:
    w0, alpha, A = _wa(f0, q, fs)
    c = np.cos(w0)
    return (A, A * (-2 * c), A, A * (-2 * c), A * (1 - alpha))
