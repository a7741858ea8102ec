"""Fused Pallas fractional resampler: DMA span windows + closed-form
windowed-sinc weights + weighted reduction, all in VMEM.

Why: the XLA banded resampler (ops/resampler.process) is dominated by the
[n_chunks, 128] window GATHER (~1.75 ms/flagship block — TPU gathers cost
~4-7 ns/element no matter the locality) plus the materialized [.., C, M]
weight/product intermediates (~1.4 ms of HBM traffic).  Here each grid
step processes one SUBTILE of 1024 outputs: ONE contiguous DMA pulls the
subtile's whole input span from HBM (the output times are monotone, so
the span is a single window), the tap weights are evaluated in place with
the same separable closed form as ops/resampler._sinc_band, and the
weighted reduction never leaves VMEM.

Geometry (all static per config):
  * outputs blocked [8, 128] per subtile (the (8,128) output tiling rule);
  * HBM slices must start on tile boundaries, so the DMA reads from the
    1024-aligned-down base and the remainder is undone with a dynamic
    flat circular roll of the loaded [rows, 128] span (row roll + lane
    roll + one-row-carry select — pltpu.roll takes traced shifts);
  * inner chunks of 256 outputs ([2, 128]) read a STATIC row slice of
    the rolled span (the rate lock's ±0.2% swing moves true window
    starts by only a few samples, absorbed by the slice margin); weights
    are 4-D [2, 128, rows, 128] tiles (outputs leading, span on the
    tiled trailing dims) — no transposes, no relayouts.

Precision: per-output times enter as (t_int_rel i32, t_frac f32), so the
cancellation-safe (m - P/2 - t_int) - t_frac form keeps full f32 accuracy
at any span offset.

Restrictions: f32 planes, even ``periods``, not vmapped (per-call scratch
+ SMEM bases).

STATUS (r4, honest D2H-slope fence): correct on-chip (2e-5 vs the XLA
banded path) but MEASURED SLOWER — 4.13 ms vs ~3.4 ms for the flagship
tail.  The per-(chunk, span-row) [128, 128] tile loop (~6k unrolled
iterations with a transpose each) is instruction-overhead-bound and does
not recover the gather savings.  Kept as a tested reference
implementation and a worked example of the HBM-alignment dodge
(aligned-down DMA + dynamic flat roll) and in-kernel native transposes;
NOT wired into production (ops/resampler keeps the XLA banded form).
Revisit if a future toolchain lowers multi-row tiles or fuses the
transposes."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cutesdr_tpu.kernels._cachefix  # noqa: F401

from cutesdr_tpu.types import K_PI

_BH_COEFS = (0.35875, 0.48829, 0.14128, 0.01168)
SINC_PERIOD_PTS = 10000
K_SUB = 1024                 # outputs per grid step ([8, 128] block)
K_CHUNK = 128                # outputs per inner chunk (one [1, 128] row)
MIN_KERNEL_OUT = 8192        # below this the XLA banded form wins


def _geometry(dt_nom: float, periods: int):
    """(chunk_span, span_len, chunk_offsets) — static slice geometry."""
    # margin: the static 128-aligned chunk offset sits up to ~191 below
    # the true window start, the rate lock swings starts by a few
    # samples, and the taps reach P past the last output in the chunk
    need = int(np.ceil(K_CHUNK * dt_nom * 1.0022)) + periods + 232
    chunk_span = -(-need // 128) * 128
    offs = []
    for c in range(K_SUB // K_CHUNK):
        o = int(np.floor(K_CHUNK * c * dt_nom)) - 32
        offs.append(max(0, (o // 128) * 128))
    span_len = max(o + chunk_span for o in offs)
    span_len = -(-span_len // 1024) * 1024
    return chunk_span, span_len, tuple(offs)


def _flat_roll(span, rem):
    """y[i] = span_flat[i + rem] for a row-major [rows, 128] span and a
    dynamic rem in [0, 1024): row roll + lane roll + one-row carry.
    pltpu.roll wants non-negative shifts, so left-rolls go as the modular
    complement."""
    rows = span.shape[0]
    r_row = rem // 128
    r_lane = rem % 128
    x1 = pltpu.roll(span, shift=(rows - r_row) % rows, axis=0)
    lsh = (128 - r_lane) % 128
    x2 = pltpu.roll(x1, shift=lsh, axis=1)
    x3 = pltpu.roll(pltpu.roll(x1, shift=rows - 1, axis=0),
                    shift=lsh, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, span.shape, 1)
    return jnp.where(lane < 128 - r_lane, x2, x3)


def _kernel(periods, chunk_span, span_len, offs, interp,
            base_ref, ti_ref, tf_ref, zr_any, zi_any,
            yr_ref, yi_ref, spanr, spani, sem_r, sem_i):
    s = pl.program_id(0)
    base = base_ref[s]
    base_row = (base // 1024) * 8          # 8-aligned row start
    rem = base - base_row * 128
    rows2 = span_len // 128 + 8

    cp_r = pltpu.make_async_copy(zr_any.at[pl.ds(base_row, rows2)],
                                 spanr, sem_r)
    cp_i = pltpu.make_async_copy(zi_any.at[pl.ds(base_row, rows2)],
                                 spani, sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    span_r = _flat_roll(spanr[:], rem)
    span_i = _flat_roll(spani[:], rem)

    P = periods
    half = P // 2
    pts = np.float32(SINC_PERIOD_PTS)
    cs_rows = chunk_span // 128

    for c in range(K_SUB // K_CHUNK):
        off = offs[c]
        orow = off // 128
        Ti = ti_ref[c:c + 1, :]                         # [1,128] i32 (rel
                                                        # to base, like m)
        tf = tf_ref[c:c + 1, :]                         # [1,128] f32
        if not interp:
            tf = jnp.ceil(tf * pts) / pts               # truncating grid

        # per-output trig (separable form, ops/resampler._sinc_band):
        # sin(pi*(m - T - P/2)) = -(-1)^(m + round(T) + P/2) * sin(pi*r)
        tf_round = jnp.round(tf)
        r = tf - tf_round                               # [-0.5, 0.5]
        sin_r = jnp.sin(np.float32(K_PI) * r)
        n_par = (Ti + tf_round.astype(jnp.int32)) % 2
        par = jnp.where(n_par == 0, 1.0, -1.0).astype(jnp.float32)
        tp = (Ti % P).astype(jnp.float32) + tf          # T mod P (+[0,1))
        num_row = par * sin_r                           # [1,128]
        cts, sts = [], []
        for kk in (1, 2, 3):
            ang = (2.0 * np.pi * kk / P) * tp
            cts.append(jnp.cos(ang))
            sts.append(jnp.sin(ang))

        # everything below is plain 2-D [128 span-sublanes, 128 output
        # lanes]: per-output rows broadcast down sublanes, per-m values
        # broadcast across lanes, span rows become columns via a native
        # transpose — the layouts Mosaic likes
        acc_r = jnp.zeros((1, 128), jnp.float32)
        acc_i = jnp.zeros((1, 128), jnp.float32)
        for rr in range(cs_rows):
            m0 = off + rr * 128
            m_col = m0 + jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
            mf = m_col.astype(np.float32)
            w = jnp.full((128, 128), _BH_COEFS[0], jnp.float32)
            for kk in (1, 2, 3):
                a = ((-1.0) ** kk) * _BH_COEFS[kk]
                ang_m = (2.0 * np.pi * kk / P) * mf
                w = w + a * (jnp.cos(ang_m) * cts[kk - 1]
                             + jnp.sin(ang_m) * sts[kk - 1])
            sign_m = jnp.where((m_col + half) % 2 == 0, -1.0, 1.0)
            numer = sign_m * num_row

            # cancellation-safe center distance, exact in i32
            vci = m_col - half - Ti
            vc = vci.astype(jnp.float32) - tf
            fi = np.float32(K_PI) * vc
            inside = (vc > -float(half)) & (vc <= float(half))
            small = jnp.abs(fi) < 1e-4
            denom = jnp.where(small, 1.0, fi)
            sv = jnp.where(small, w, w * numer / denom)
            sv = jnp.where(inside, sv, 0.0)

            srow_r = span_r[orow + rr:orow + rr + 1, :]
            srow_i = span_i[orow + rr:orow + rr + 1, :]
            s_col_r = jnp.transpose(
                jnp.broadcast_to(srow_r, (128, 128)), (1, 0))
            s_col_i = jnp.transpose(
                jnp.broadcast_to(srow_i, (128, 128)), (1, 0))
            acc_r = acc_r + jnp.sum(sv * s_col_r, axis=0, keepdims=True)
            acc_i = acc_i + jnp.sum(sv * s_col_i, axis=0, keepdims=True)

        yr_ref[c:c + 1, :] = acc_r
        yi_ref[c:c + 1, :] = acc_i


@functools.partial(jax.jit, static_argnames=(
    "periods", "dt_nom", "interp", "interpret"))
def _resample_padded(zr2, zi2, base, ti, tf, periods, dt_nom, interp,
                     interpret=False):
    chunk_span, span_len, offs = _geometry(dt_nom, periods)
    n_sub = base.shape[0]
    rows = n_sub * 8
    rows2 = span_len // 128 + 8
    kern = functools.partial(_kernel, periods, chunk_span, span_len, offs,
                             interp)
    yr, yi = pl.pallas_call(
        kern,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # base
            pl.BlockSpec((8, 128), lambda s: (s, 0)),         # t_int rel
            pl.BlockSpec((8, 128), lambda s: (s, 0)),         # t_frac
            pl.BlockSpec(memory_space=pl.ANY),             # z re rows
            pl.BlockSpec(memory_space=pl.ANY),             # z im rows
        ],
        out_specs=[pl.BlockSpec((8, 128), lambda s: (s, 0)),
                   pl.BlockSpec((8, 128), lambda s: (s, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((rows2, 128), jnp.float32),
                        pltpu.VMEM((rows2, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(base, ti, tf, zr2, zi2)
    return yr, yi


def resample_band(z_re: jax.Array, z_im: jax.Array, t_int: jax.Array,
                  t_frac: jax.Array, max_out: int, periods: int,
                  dt_nom: float, interp: bool,
                  interpret: bool = False):
    """(y_re, y_im) [max_out] for output times (t_int + t_frac) into the
    z planes (z[t] convolved with the P taps at t+1..t+P, exactly the
    ops/resampler banded semantics).  Times may run past the valid input;
    callers mask with their validity count (z is padded here so every
    span window stays in bounds)."""
    k = t_int.shape[-1]
    pad_out = (-k) % K_SUB
    if pad_out:
        t_int = jnp.concatenate(
            [t_int, jnp.broadcast_to(t_int[-1:], (pad_out,))])
        t_frac = jnp.concatenate(
            [t_frac, jnp.zeros((pad_out,), t_frac.dtype)])
    n_sub = (k + pad_out) // K_SUB
    chunk_span, span_len, _ = _geometry(dt_nom, periods)

    base = jnp.clip(t_int[::K_SUB], 0, None)
    pad_z = span_len + 3 * 1024    # aligned-down start + span + slack
    nz = z_re.shape[-1] + pad_z
    nz = -(-nz // 1024) * 1024
    pad_z = nz - z_re.shape[-1]
    zr = jnp.concatenate([z_re, jnp.zeros((pad_z,), z_re.dtype)])
    zi = jnp.concatenate([z_im, jnp.zeros((pad_z,), z_im.dtype)])

    ti_rel = (t_int - jnp.repeat(base, K_SUB)).reshape(n_sub * 8, 128)
    tf2 = t_frac.reshape(n_sub * 8, 128)
    yr, yi = _resample_padded(zr.reshape(-1, 128), zi.reshape(-1, 128),
                              base.astype(jnp.int32),
                              ti_rel.astype(jnp.int32), tf2,
                              periods, float(dt_nom), bool(interp),
                              interpret=interpret)
    return yr.reshape(-1)[:k], yi.reshape(-1)[:k]
