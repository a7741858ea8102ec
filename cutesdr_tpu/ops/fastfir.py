"""FFT overlap-save fast convolution — the main channel bandpass filter.

Reference analogue: CFastFIR (dsp/fastfir.cpp:268-306): a serial per-sample
buffer-fill loop that fires a 2048-pt FFT → H multiply → IFFT every 1024
samples, keeping a 1024-sample overlap.

TPU design: the block is reshaped into *all* of its overlap-save frames at
once — [n_frames, 2048] with hop 1024 — and a single batched FFT·H·IFFT
processes every frame in parallel.  The only state is the last
(FIR_SIZE-1)-sample input tail.  Output alignment and values match the
reference exactly: frame f (with z = [tail | block]) covers z[f·V : f·V+NFFT]
and contributes its last V = NFFT-(FIR-1) samples.

The filter H comes from design/fastfir_design.py and already includes the
1/NFFT scale the reference folds in; since jnp.fft.ifft scales by 1/NFFT
itself (the reference's RevFFT is unscaled), the runtime multiplies by NFFT
once, keeping H bit-identical with the reference design.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cutesdr_tpu.design.fastfir_design import (CONV_FFT_SIZE, CONV_FIR_SIZE,
                                               design_fastfir)


class FastFirParams(NamedTuple):
    h_freq: jax.Array    # [NFFT] complex frequency response (incl. 1/NFFT)


class FastFirCarry(NamedTuple):
    tail: jax.Array      # [FIR-1] complex input history


NFFT = CONV_FFT_SIZE
NFIR = CONV_FIR_SIZE
VALID = NFFT - (NFIR - 1)   # 1024 output samples per frame


def init(f_lo_cut: float, f_hi_cut: float, offset: float, sample_rate: float,
         cdtype=jnp.complex64) -> tuple[FastFirParams, FastFirCarry]:
    h = design_fastfir(f_lo_cut, f_hi_cut, offset, sample_rate)
    return (FastFirParams(h_freq=jnp.asarray(h, cdtype)),
            FastFirCarry(tail=jnp.zeros(NFIR - 1, cdtype)))


def retune(params: FastFirParams, f_lo_cut: float, f_hi_cut: float,
           offset: float, sample_rate: float) -> FastFirParams:
    h = design_fastfir(f_lo_cut, f_hi_cut, offset, sample_rate)
    return FastFirParams(h_freq=jnp.asarray(h, params.h_freq.dtype))


def filter_frames(h_freq: jax.Array, z: jax.Array) -> jax.Array:
    """Overlap-save core on an explicit [NFIR-1 + n] history+block buffer;
    returns n filtered samples.  Also used by the time-sharded front-end,
    where the history is a ppermute'd halo instead of a carried tail."""
    n = z.shape[-1] - (NFIR - 1)
    if n % VALID:
        raise ValueError(f"fastfir block length {n} not a multiple of {VALID}")
    n_frames = n // VALID
    # frame f = z[f*VALID : f*VALID + NFFT]
    idx = (np.arange(NFFT)[None, :] + VALID * np.arange(n_frames)[:, None])
    frames = z[..., idx]                                  # [..., n_frames, NFFT]
    spec = jnp.fft.fft(frames, axis=-1)
    yf = jnp.fft.ifft(spec * h_freq, axis=-1) * NFFT
    y = yf[..., NFIR - 1:]                                # [..., n_frames, VALID]
    return y.reshape(y.shape[:-2] + (n,)).astype(z.dtype)


def process(params: FastFirParams, carry: FastFirCarry,
            x: jax.Array) -> tuple[FastFirCarry, jax.Array]:
    """len(x) must be a multiple of VALID (=1024); returns len(x) samples."""
    z = jnp.concatenate([carry.tail, x], axis=-1)        # [NFIR-1 + n]
    y = filter_frames(params.h_freq, z)
    return FastFirCarry(tail=z[..., z.shape[-1] - (NFIR - 1):]), y
