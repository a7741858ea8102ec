"""Arbitrary-ratio fractional resampler (windowed-sinc interpolation).

Reference analogue: CFractResampler (dsp/fractresampler.cpp): a 28-period
Blackman-Harris windowed sinc table at 10,000 points per zero crossing; each
output sample convolves 28 input taps selected by a floating-point time
accumulator, which carries fractional phase across blocks.

TPU design: all output timestamps for a block are computed at once
(t_k = t0 + k·dt), the 28-tap windows and sinc values are two parallel
gathers, and the dot products are one batched reduction.  The output count
per block is data-dependent in the reference (while-loop); here the block
yields a *static* ``max_out`` with a validity count, so shapes stay static
under jit — callers consume ``n_valid`` samples.

Numerics: timestamps use an exact split-precision scheme (dt = dt_hi + dt_lo
with dt_hi a multiple of 2^-12 so k·dt_hi is exact in float32) giving ~1e-7
fractional-phase accuracy without float64 — see _times().
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cutesdr_tpu.design.windows import window_table
from cutesdr_tpu.types import K_PI, complex_zeros

SINC_PERIOD_PTS = 10000
SINC_PERIODS = 28            # reference-exact default (fractresampler.cpp:50)
SINC_LENGTH = SINC_PERIODS * SINC_PERIOD_PTS + 1
MAX_SOUNDCARDVAL = 32767.0

_DT_SPLIT = 4096.0   # dt_hi quantum 2^-12


def make_sinc_table(rdtype=np.float32,
                    periods: int = SINC_PERIODS) -> np.ndarray:
    """Blackman-Harris windowed sinc, identical formula to the reference
    table builder (dsp/fractresampler.cpp:101-114).  ``periods`` > 28
    raises the method's SNR ceiling beyond the reference's (the window gets
    longer, so its transition region narrows and the interpolation images
    drop); 28 reproduces the reference table exactly."""
    length = periods * SINC_PERIOD_PTS + 1
    i = np.arange(length, dtype=np.float64)
    window = window_table("blackman_harris", length)
    fi = K_PI * (i - length // 2) / SINC_PERIOD_PTS
    with np.errstate(invalid="ignore", divide="ignore"):
        s = window * np.sin(fi) / fi
    s[length // 2] = 1.0
    return s.astype(rdtype)


class ResamplerParams(NamedTuple):
    sinc: jax.Array      # [SINC_LENGTH]
    dt_hi: jax.Array     # rate split: dt = in_rate/out_rate = dt_hi + dt_lo
    dt_lo: jax.Array


class ResamplerCarry(NamedTuple):
    tail: jax.Array      # [SINC_PERIODS] input history
    t0: jax.Array        # fractional time offset in [0, dt)


def split_rate(rate: float) -> tuple[np.float32, np.float32]:
    hi = np.round(rate * _DT_SPLIT) / _DT_SPLIT
    return np.float32(hi), np.float32(rate - hi)


def init(rate: float, complex_input: bool = False, rdtype=jnp.float32,
         periods: int = SINC_PERIODS) -> tuple[ResamplerParams, ResamplerCarry]:
    hi, lo = split_rate(rate)
    zero = jnp.zeros((), rdtype)
    tdtype = jax.lax.complex(zero, zero).dtype if complex_input else rdtype
    return (ResamplerParams(sinc=jnp.asarray(make_sinc_table(periods=periods),
                                             rdtype),
                            dt_hi=jnp.asarray(hi, rdtype),
                            dt_lo=jnp.asarray(lo, rdtype)),
            ResamplerCarry(tail=complex_zeros(periods, tdtype),
                           t0=jnp.zeros((), rdtype)))


def set_rate(params: ResamplerParams, rate: float) -> ResamplerParams:
    """Update the resample ratio (e.g. from the audio rate-lock loop);
    traced-scalar update, no recompile."""
    hi, lo = split_rate(rate)
    return params._replace(dt_hi=jnp.asarray(hi, params.dt_hi.dtype),
                           dt_lo=jnp.asarray(lo, params.dt_lo.dtype))


def max_out_for(block_len: int, nominal_rate: float) -> int:
    """Static per-block output capacity with margin for rate corrections.

    The audio rate-lock's P controller can swing the ratio by up to
    ±queue_half·P_GAIN ≈ ±0.2% (interface/soundout.cpp:456-462), so the
    margin must exceed that or peak corrections would silently drop
    samples against the static output shape."""
    return int(np.ceil(block_len / (nominal_rate * 0.996))) + 4


def _times(params: ResamplerParams, t0, k):
    """Exact-ish (t_int, t_frac) of t_k = t0 + k*dt.

    a = k*dt_hi is exactly representable (k < 2^11, dt_hi multiple of 2^-12,
    product < 2^24 quanta), so frac(a) is exact; b = t0 + k*dt_lo stays in
    [-0.5, 1.5] where float32 keeps ~1e-7 absolute accuracy.
    """
    a = k * params.dt_hi
    b = t0 + k * params.dt_lo
    a_int = jnp.floor(a)
    ftot = (a - a_int) + b
    f_int = jnp.floor(ftot)
    return (a_int + f_int).astype(jnp.int32), ftot - f_int


def process(params: ResamplerParams, carry: ResamplerCarry, x: jax.Array,
            max_out: int,
            interp: bool = False) -> tuple[ResamplerCarry, jax.Array, jax.Array]:
    """Resample one block.

    Returns (carry', y[max_out], n_valid).  y[k] for k >= n_valid is zero.

    ``interp=True`` linearly interpolates between sinc-table points; at the
    reference's 28 periods the measured SNR is unchanged (~70 dB — the
    ceiling there is the window itself, not table quantization) so it
    defaults off (reference-exact truncating lookup).  With a longer table
    (``init(periods=...)``) the window ceiling rises and interp matters —
    tests/test_ops.py::test_resampler_long_sinc_snr measures the combined
    effect.

    The tap count is derived from ``carry.tail``, so one compiled program
    per sinc length (static shape).
    """
    n = x.shape[-1]
    periods = carry.tail.shape[-1]
    length = params.sinc.shape[-1]
    rdtype = params.dt_hi.dtype
    k = jnp.arange(max_out, dtype=rdtype)
    t_int, t_frac = _times(params, carry.t0, k)            # [max_out]

    z = jnp.concatenate([carry.tail, x], axis=-1)          # z[m] = x[m-P]
    i = jnp.arange(1, periods + 1)
    valid = t_int < n
    t_safe = jnp.where(valid, t_int, 0)
    win = z[..., t_safe[:, None] + i[None, :]]             # [max_out, P]
    spos = (i[None, :].astype(rdtype) - t_frac[:, None]) * SINC_PERIOD_PTS
    sindx = spos.astype(jnp.int32)                         # truncates
    s0 = params.sinc[jnp.clip(sindx, 0, length - 1)]       # [max_out, P]
    if interp:
        s1 = params.sinc[jnp.clip(sindx + 1, 0, length - 1)]
        frac = spos - sindx.astype(rdtype)
        sv = s0 + frac * (s1 - s0)
    else:
        sv = s0

    if jnp.iscomplexobj(x):
        y = (jnp.sum(win.real * sv, axis=-1)
             + 1j * jnp.sum(win.imag * sv, axis=-1)).astype(x.dtype)
    else:
        y = jnp.sum(win * sv, axis=-1).astype(x.dtype)
    y = jnp.where(valid, y, jnp.zeros((), y.dtype))
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # t0' = t0 + n_valid*dt - n, via the same exact split
    cnt = n_valid.astype(rdtype)
    a = cnt * params.dt_hi
    t0_new = (a - n) + (carry.t0 + cnt * params.dt_lo)
    return (ResamplerCarry(tail=z[..., z.shape[-1] - periods:],
                           t0=t0_new),
            y, n_valid)


def to_int16(y: jax.Array, gain, stereo: bool = False) -> jax.Array:
    """Gain + clip + int16 quantize (soundcard format).  Complex input with
    ``stereo`` maps re->left, im->right; real input gives mono."""
    if jnp.iscomplexobj(y):
        g = jnp.stack([y.real, y.imag], axis=-1) * gain
    else:
        g = y * gain
    g = jnp.clip(g, -MAX_SOUNDCARDVAL, MAX_SOUNDCARDVAL)
    return g.astype(jnp.int16)
