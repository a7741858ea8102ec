"""Pallas overlap-save channel filter: permutation-free four-step FFT.

Fuses the whole FFT → ·H → IFFT per frame in VMEM (the XLA path routes each
FFT through a custom call with HBM round-trips between stages).  The usual
blocker for FFTs in Mosaic — bit-reversal / transpose passes and arbitrary
reshapes — is designed away:

  * decompose N = 2048 as n = n1 + 128·n2 (n1 ∈ [0,128), n2 ∈ [0,16)): a
    frame *is* the native [16, 128] row-major view of the stream — no data
    movement to form it, and frame windows are row-aligned slices of the
    [rows, 128] stream view (hop 1024 = 8 rows);
  * four-step DFT:  S[k2, k1] = (T ⊙ (D16 @ B)) @ D128  with
    T[k2, n1] = W_N^{n1·k2} — the 128-point outer DFT is a native
    128-contraction MXU matmul, the 16-point inner DFT a small matmul;
  * the spectrum comes out in (k2, k1) order with k = k2 + 16·k1 — never
    naturalized: H is stored pre-permuted as H2[k2, k1] = H[k2 + 16·k1]
    (still a traced, retunable param) and the inverse four-step absorbs the
    ordering symmetrically;
  * valid overlap-save output = samples n ≥ 1024 = rows 8..15 of the
    result — a row slice, written as an (8, 128) output block (exactly the
    minimum f32 tile).

Numerics: validated to ~1e-14 against numpy FFT overlap-save in float64
(see the derivation notes in DESIGN.md §10) and against ops.fastfir in
tests/test_kernels.py.  Complex arithmetic runs as planar real matmuls
(4 per complex product, 16 real matmuls per frame).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cutesdr_tpu.design.fastfir_design import design_fastfir
from cutesdr_tpu.types import complex_zeros

N = 2048
N1 = 128          # outer DFT size (lane dimension)
N2 = 16           # inner DFT size (sublane dimension)
VALID = 1024      # output samples per frame
TAIL = N - VALID  # carried history (8 rows)


def _dft_tables():
    d16 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    d128 = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N1)) / N)
    return d16, d128, tw


def _cmatmul(ar, ai, br, bi):
    """(ar+i·ai) @ (br+i·bi) as planar f32 matmuls."""
    rr = jnp.dot(ar, br, preferred_element_type=jnp.float32) \
        - jnp.dot(ai, bi, preferred_element_type=jnp.float32)
    ri = jnp.dot(ar, bi, preferred_element_type=jnp.float32) \
        + jnp.dot(ai, br, preferred_element_type=jnp.float32)
    return rr, ri


def _kernel(z_re_ref, z_im_ref,             # ANY [rows, 128] stream views
            d16_ref, d128_ref, tw_ref,      # VMEM constants [2, ...] (re, im)
            h2_ref,                         # VMEM [2, 16, 128] pre-permuted H
            y_re_ref, y_im_ref,             # out blocks [8, 128]
            *, n_frames: int):
    f = pl.program_id(0)

    def body(br_s, bi_s, sem):
        row0 = pl.multiple_of(f * (VALID // N1), VALID // N1)
        cp1 = pltpu.make_async_copy(z_re_ref.at[pl.ds(row0, N2)], br_s,
                                    sem.at[0])
        cp2 = pltpu.make_async_copy(z_im_ref.at[pl.ds(row0, N2)], bi_s,
                                    sem.at[1])
        cp1.start()
        cp2.start()
        d16r, d16i = d16_ref[0], d16_ref[1]
        d128r, d128i = d128_ref[0], d128_ref[1]
        twr, twi = tw_ref[0], tw_ref[1]
        h2r, h2i = h2_ref[0], h2_ref[1]
        cp1.wait()
        cp2.wait()

        # forward: S = (T ⊙ (D16 @ B)) @ D128
        cr, ci = _cmatmul(d16r, d16i, br_s[:], bi_s[:])
        cpr = twr * cr - twi * ci
        cpi = twr * ci + twi * cr
        sr, si = _cmatmul(cpr, cpi, d128r, d128i)

        # multiply by the (pre-permuted) filter response
        pr = sr * h2r - si * h2i
        pi = sr * h2i + si * h2r

        # inverse: y_B = conj(D16) @ (conj(T) ⊙ (P @ conj(D128)))
        qr, qi = _cmatmul(pr, pi, d128r, -d128i)
        qpr = twr * qr + twi * qi
        qpi = twr * qi - twi * qr
        yr, yi = _cmatmul(d16r, -d16i, qpr, qpi)

        # valid overlap-save output: sample n >= 1024  <=>  rows 8..15
        y_re_ref[:] = yr[N2 - VALID // N1:, :]
        y_im_ref[:] = yi[N2 - VALID // N1:, :]

    pl.run_scoped(
        body,
        pltpu.VMEM((N2, N1), jnp.float32),
        pltpu.VMEM((N2, N1), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


class FastFir4Params(NamedTuple):
    h2: jax.Array        # [2, 16, 128] pre-permuted H (re, im planes)


class FastFir4Carry(NamedTuple):
    tail: jax.Array      # [1024] complex input history


def _permute_h(h: np.ndarray) -> np.ndarray:
    h2 = h.reshape(N1, N2).T            # H2[k2, k1] = H[k2 + 16*k1]
    return np.stack([h2.real, h2.imag]).astype(np.float32)


class FastFirFourStep:
    """Drop-in fused alternative to ops.fastfir (fixed 2048/1025 sizes)."""

    def __init__(self, f_lo_cut: float, f_hi_cut: float, offset: float,
                 sample_rate: float, interpret: bool = False):
        h = design_fastfir(f_lo_cut, f_hi_cut, offset, sample_rate)
        self.sample_rate = sample_rate
        self.interpret = interpret
        d16, d128, tw = _dft_tables()
        # keep as host arrays: closure-captured *device* constants force a
        # device->host pull at trace time (breaks on transfer-limited
        # backends); numpy constants embed directly
        self._d16 = np.stack([d16.real, d16.imag]).astype(np.float32)
        self._d128 = np.stack([d128.real, d128.imag]).astype(np.float32)
        self._tw = np.stack([tw.real, tw.imag]).astype(np.float32)
        self.params = FastFir4Params(h2=jnp.asarray(_permute_h(h)))

    def retune(self, f_lo_cut: float, f_hi_cut: float, offset: float) -> None:
        h = design_fastfir(f_lo_cut, f_hi_cut, offset, self.sample_rate)
        self.params = FastFir4Params(h2=jnp.asarray(_permute_h(h)))

    def init_carry(self) -> FastFir4Carry:
        return FastFir4Carry(tail=complex_zeros(TAIL, jnp.complex64))

    def __call__(self, params: FastFir4Params, carry: FastFir4Carry,
                 x: jax.Array) -> tuple[FastFir4Carry, jax.Array]:
        n = x.shape[-1]
        if n % VALID:
            raise ValueError(f"block {n} not a multiple of {VALID}")
        n_frames = n // VALID
        z = jnp.concatenate([carry.tail, x])
        rows = z.shape[-1] // N1
        z_re = z.real.reshape(rows, N1)
        z_im = z.imag.reshape(rows, N1)

        kernel = functools.partial(_kernel, n_frames=n_frames)
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(n_frames,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((VALID // N1, N1), lambda f: (f, 0)),
                pl.BlockSpec((VALID // N1, N1), lambda f: (f, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_frames * VALID // N1, N1),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_frames * VALID // N1, N1),
                                     jnp.float32),
            ),
            interpret=self.interpret,
        )(z_re, z_im, self._d16, self._d128, self._tw, params.h2)

        y = jax.lax.complex(y_re.reshape(-1), y_im.reshape(-1))
        return FastFir4Carry(tail=z[z.shape[-1] - TAIL:]), y
