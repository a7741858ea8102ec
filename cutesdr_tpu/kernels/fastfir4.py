"""Pallas overlap-save channel filter: permutation-free four-step FFT.

Fuses the whole FFT → ·H → IFFT per frame in VMEM (the XLA path routes each
FFT through a custom call with HBM round-trips between stages).  The usual
blocker for FFTs in Mosaic — bit-reversal / transpose passes and arbitrary
reshapes — is designed away:

  * decompose N = 128·N2 as n = n1 + 128·n2 (n1 ∈ [0,128), n2 ∈ [0,N2)): a
    frame *is* the native [N2, 128] row-major view of the stream — no data
    movement to form it, and frame windows are row-aligned slices of the
    [rows, 128] stream view (hop VALID/128 rows);
  * four-step DFT:  S[k2, k1] = (T ⊙ (D_N2 @ B)) @ D128  with
    T[k2, n1] = W_N^{n1·k2} — the 128-point outer DFT is a native
    128-contraction MXU matmul, the N2-point inner DFT a small matmul;
  * the spectrum comes out in (k2, k1) order with k = k2 + N2·k1 — never
    naturalized: H is stored pre-permuted as H2[k2, k1] = H[k2 + N2·k1]
    (still a traced, retunable param) and the inverse four-step absorbs the
    ordering symmetrically;
  * valid overlap-save output = the last VALID/128 rows of the result —
    a row slice, written as (VALID/128, 128) output blocks (VALID is
    required to be a multiple of 1024 so blocks respect the (8, 128)
    f32 tile).

Any (nfft, ntaps) with nfft % 128 == 0, nfft ≥ 256 and
valid = nfft − ntaps + 1 a positive multiple of 1024 is supported
(pipeline.receiver.fastfir4_supported); the reference's 2048/1025
(dsp/fastfir.cpp:55-57) is the default.

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

# default (reference) sizes, kept as module constants for back-compat
N = 2048
N1 = 128          # outer DFT size (lane dimension) — fixed
N2 = 16           # inner DFT size (sublane dimension) for the default N
VALID = 1024      # output samples per frame for the default sizes
TAIL = N - VALID  # carried history (8 rows)


def _dft_tables(n2: int):
    dn2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    d128 = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(N1))
                / (N1 * n2))
    return dn2, d128, tw


def _cmatmul(ar, ai, br, bi):
    """(ar+i·ai) @ (br+i·bi) as planar f32 matmuls.

    precision=HIGHEST matters: preferred_element_type only sets the
    ACCUMULATOR dtype — under the default precision the MXU truncates the
    f32 inputs to one bf16 pass, flooring the whole channel filter near
    -84 dB (measured r4: tone-test floor 84 dB vs 146 dB for the XLA fft
    path).  The 3-pass f32 mode restores it for ~3x the MXU time, which
    this kernel has 4x headroom for."""
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    rr = jnp.dot(ar, br, **kw) - jnp.dot(ai, bi, **kw)
    ri = jnp.dot(ar, bi, **kw) + jnp.dot(ai, br, **kw)
    return rr, ri


def _frame(br, bi, dn2r, dn2i, d128r, d128i, twr, twi, h2r, h2i,
           n2, valid_rows):
    """One frame's FFT → ·H → IFFT; returns the valid overlap-save rows."""
    # forward: S = (T ⊙ (D_N2 @ B)) @ D128
    cr, ci = _cmatmul(dn2r, dn2i, br, bi)
    cpr = twr * cr - twi * ci
    cpi = twr * ci + twi * cr
    sr, si = _cmatmul(cpr, cpi, d128r, d128i)

    # multiply by the (pre-permuted) filter response
    pr = sr * h2r - si * h2i
    pi = sr * h2i + si * h2r

    # inverse: y_B = conj(D_N2) @ (conj(T) ⊙ (P @ conj(D128)))
    qr, qi = _cmatmul(pr, pi, d128r, -d128i)
    qpr = twr * qr + twi * qi
    qpi = twr * qi - twi * qr
    yr, yi = _cmatmul(dn2r, -dn2i, qpr, qpi)

    # valid overlap-save output: the last valid_rows rows
    return yr[n2 - valid_rows:, :], yi[n2 - valid_rows:, :]


def _kernel(z_re_ref, z_im_ref,             # ANY [rows, 128] stream views
            dn2_ref, d128_ref, tw_ref,      # VMEM constants [2, ...] (re, im)
            h2_ref,                         # VMEM [2, n2, 128] pre-permuted H
            y_re_ref, y_im_ref,             # out [fps*valid_rows, 128]
            *, n2: int, valid_rows: int, fps: int = 1):
    """``fps`` frames per grid step (r5): the per-frame form ran 256 grid
    steps of ~1-2 us work each on the flagship block — per-step overhead
    was a third of the whole channel filter.  One DMA pulls the fps
    frames' union window (consecutive frames overlap by n2-valid_rows
    rows) and an unrolled loop reuses the per-frame pipeline."""
    g = pl.program_id(0)
    m_rows = fps * valid_rows + (n2 - valid_rows)

    def body(br_s, bi_s, sem):
        row0 = pl.multiple_of(g * fps * valid_rows, fps * valid_rows)
        cp1 = pltpu.make_async_copy(z_re_ref.at[pl.ds(row0, m_rows)], br_s,
                                    sem.at[0])
        cp2 = pltpu.make_async_copy(z_im_ref.at[pl.ds(row0, m_rows)], bi_s,
                                    sem.at[1])
        cp1.start()
        cp2.start()
        dn2r, dn2i = dn2_ref[0], dn2_ref[1]
        d128r, d128i = d128_ref[0], d128_ref[1]
        twr, twi = tw_ref[0], tw_ref[1]
        h2r, h2i = h2_ref[0], h2_ref[1]
        cp1.wait()
        cp2.wait()

        for f in range(fps):
            r0 = f * valid_rows
            yr, yi = _frame(br_s[r0:r0 + n2, :], bi_s[r0:r0 + n2, :],
                            dn2r, dn2i, d128r, d128i, twr, twi, h2r, h2i,
                            n2, valid_rows)
            y_re_ref[r0:r0 + valid_rows, :] = yr
            y_im_ref[r0:r0 + valid_rows, :] = yi

    pl.run_scoped(
        body,
        pltpu.VMEM((m_rows, N1), jnp.float32),
        pltpu.VMEM((m_rows, N1), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def _kernel_batch(z_re_ref, z_im_ref,       # ANY [C, rows, 128] stream views
                  dn2_ref, d128_ref, tw_ref,  # VMEM constants [2, ...]
                  h2_ref,                   # VMEM [1, 2, n2, 128] this channel
                  y_re_ref, y_im_ref,       # out blocks [1, valid_rows, 128]
                  *, n2: int, valid_rows: int):
    """Channel-bank form of _kernel: grid (n_channels, n_frames) with the
    channel as the leading (outer) grid axis, so each channel's
    pre-permuted H block is fetched once and reused across its frames.
    Identical math per (channel, frame) to the single-stream kernel."""
    c = pl.program_id(0)
    f = pl.program_id(1)

    def body(br_s, bi_s, sem):
        row0 = pl.multiple_of(f * valid_rows, valid_rows)
        cp1 = pltpu.make_async_copy(z_re_ref.at[c, pl.ds(row0, n2)], br_s,
                                    sem.at[0])
        cp2 = pltpu.make_async_copy(z_im_ref.at[c, pl.ds(row0, n2)], bi_s,
                                    sem.at[1])
        cp1.start()
        cp2.start()
        dn2r, dn2i = dn2_ref[0], dn2_ref[1]
        d128r, d128i = d128_ref[0], d128_ref[1]
        twr, twi = tw_ref[0], tw_ref[1]
        h2r, h2i = h2_ref[0, 0], h2_ref[0, 1]
        cp1.wait()
        cp2.wait()

        yr, yi = _frame(br_s[:], bi_s[:], dn2r, dn2i, d128r, d128i,
                        twr, twi, h2r, h2i, n2, valid_rows)
        y_re_ref[0] = yr
        y_im_ref[0] = yi

    pl.run_scoped(
        body,
        pltpu.VMEM((n2, N1), jnp.float32),
        pltpu.VMEM((n2, N1), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


class FastFir4Params(NamedTuple):
    h2: jax.Array        # [2, n2, 128] pre-permuted H (re, im planes)


class FastFir4Carry(NamedTuple):
    tail: jax.Array      # [ntaps-1] complex input history


def _permute_h(h: np.ndarray, n2: int) -> np.ndarray:
    h2 = h.reshape(N1, n2).T            # H2[k2, k1] = H[k2 + n2*k1]
    return np.stack([h2.real, h2.imag]).astype(np.float32)


class FastFirFourStep:
    """Drop-in fused alternative to ops.fastfir (any legal nfft/ntaps pair;
    defaults to the reference's 2048/1025)."""

    def __init__(self, f_lo_cut: float, f_hi_cut: float, offset: float,
                 sample_rate: float, nfft: int = N, ntaps: int = N - VALID + 1,
                 interpret: bool = False):
        from cutesdr_tpu.pipeline.receiver import fastfir4_supported
        if not fastfir4_supported(nfft, ntaps):
            raise ValueError(
                f"fastfir4 unsupported sizes nfft={nfft} ntaps={ntaps} "
                "(need nfft % 128 == 0, nfft >= 256, and "
                "valid = nfft-ntaps+1 a positive multiple of 1024)")
        self.nfft, self.ntaps = nfft, ntaps
        self.n2 = nfft // N1
        self.valid = nfft - ntaps + 1
        self.valid_rows = self.valid // N1
        self.sample_rate = sample_rate
        self.interpret = interpret
        dn2, d128, tw = _dft_tables(self.n2)
        # keep as host arrays: closure-captured *device* constants force a
        # device->host pull at trace time (breaks on transfer-limited
        # backends); numpy constants embed directly
        self._dn2 = np.stack([dn2.real, dn2.imag]).astype(np.float32)
        self._d128 = np.stack([d128.real, d128.imag]).astype(np.float32)
        self._tw = np.stack([tw.real, tw.imag]).astype(np.float32)
        self.retune(f_lo_cut, f_hi_cut, offset)

    def retune(self, f_lo_cut: float, f_hi_cut: float, offset: float) -> None:
        h = design_fastfir(f_lo_cut, f_hi_cut, offset, self.sample_rate,
                           fft_size=self.nfft, fir_size=self.ntaps)
        self.params = FastFir4Params(h2=jnp.asarray(_permute_h(h, self.n2)))

    def init_carry(self) -> FastFir4Carry:
        return FastFir4Carry(
            tail=complex_zeros(self.ntaps - 1, jnp.complex64))

    def filter_frames(self, params: FastFir4Params,
                      z: jax.Array, fps: int | None = None) -> jax.Array:
        """Overlap-save core on an explicit [ntaps-1 + n] history+block
        buffer; returns n filtered samples (the stateless form
        ops.fastfir.filter_frames exposes, used by the time-sharded
        front-end where the history is a ppermute'd halo)."""
        n = z.shape[-1] - (self.ntaps - 1)
        if n % self.valid:
            raise ValueError(f"block {n} not a multiple of {self.valid}")
        n_frames = n // self.valid
        # pad the head so frame windows start on whole 128-lane rows:
        # frame f covers z[f*valid : f*valid + nfft]; with the (ntaps-1)
        # history the buffer is already row-aligned for legal sizes
        rows = z.shape[-1] // N1
        z_re = z.real.reshape(rows, N1)
        z_im = z.imag.reshape(rows, N1)

        # frames per grid step: 1 (measured best).  The batched form was
        # built on the hypothesis that 256 single-frame grid steps were
        # per-step-overhead bound; the r5 fps sweep (1/4/8/16 at 262k,
        # slope fence) measured 0.29/0.32/0.45/0.30 ms — no win, fps=8
        # WORSE (the union-window DMA serializes against the whole
        # step's compute, where single-frame steps pipeline).  Kept as a
        # knob for future toolchains.
        if fps is None:
            fps = 1
        kernel = functools.partial(_kernel, n2=self.n2,
                                   valid_rows=self.valid_rows, fps=fps)
        vr = self.valid_rows
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(n_frames // fps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((fps * vr, N1), lambda g: (g, 0)),
                pl.BlockSpec((fps * vr, N1), lambda g: (g, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_frames * vr, N1), jnp.float32),
                jax.ShapeDtypeStruct((n_frames * vr, N1), jnp.float32),
            ),
            interpret=self.interpret,
        )(z_re, z_im, self._dn2, self._d128, self._tw, params.h2)

        return jax.lax.complex(y_re.reshape(-1), y_im.reshape(-1))

    def __call__(self, params: FastFir4Params, carry: FastFir4Carry,
                 x: jax.Array) -> tuple[FastFir4Carry, jax.Array]:
        z = jnp.concatenate([carry.tail, x])
        y = self.filter_frames(params, z)
        return FastFir4Carry(tail=z[z.shape[-1] - (self.ntaps - 1):]), y

    def filter_frames_batch(self, params: FastFir4Params,
                            z: jax.Array) -> jax.Array:
        """Channel-bank overlap-save core: ``z`` is [C, ntaps-1 + n]
        complex (per-channel history + block), ``params.h2`` carries a
        leading channel axis [C, 2, n2, 128].  One pallas_call with a
        (C, n_frames) grid — the explicit channel grid axis is what plain
        vmap over filter_frames cannot synthesize (ANY-memory-space
        blocks with non-trivial index maps are not batchable), and what
        lets banks keep the fused kernel instead of the 4x-slower XLA
        fft path."""
        nch = z.shape[0]
        n = z.shape[-1] - (self.ntaps - 1)
        if n % self.valid:
            raise ValueError(f"block {n} not a multiple of {self.valid}")
        n_frames = n // self.valid
        rows = z.shape[-1] // N1
        z_re = z.real.reshape(nch, rows, N1)
        z_im = z.imag.reshape(nch, rows, N1)

        kernel = functools.partial(_kernel_batch, n2=self.n2,
                                   valid_rows=self.valid_rows)
        y_re, y_im = pl.pallas_call(
            kernel,
            grid=(nch, n_frames),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, self.n2, N1), lambda c, f: (c, 0, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, self.valid_rows, N1), lambda c, f: (c, f, 0)),
                pl.BlockSpec((1, self.valid_rows, N1), lambda c, f: (c, f, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nch, n_frames * self.valid_rows, N1),
                                     jnp.float32),
                jax.ShapeDtypeStruct((nch, n_frames * self.valid_rows, N1),
                                     jnp.float32),
            ),
            interpret=self.interpret,
        )(z_re, z_im, self._dn2, self._d128, self._tw, params.h2)

        return jax.lax.complex(y_re.reshape(nch, -1), y_im.reshape(nch, -1))

    def batch_call(self, params: FastFir4Params, carry: FastFir4Carry,
                   x: jax.Array) -> tuple[FastFir4Carry, jax.Array]:
        """Streaming channel-bank entry: leading channel axis on
        params/carry/x, same carry discipline as __call__ per channel."""
        z = jnp.concatenate([carry.tail, x], axis=-1)
        y = self.filter_frames_batch(params, z)
        return FastFir4Carry(tail=z[:, z.shape[-1] - (self.ntaps - 1):]), y
