"""Pallas first-order affine scan:  x[n] = A[n]·x[n-1] + b[n].

Why a kernel: XLA's ``associative_scan`` on a flat [N] f32 runs ~0.35 ms
for 262k elements on v5e — ~7x off the memory roofline, because its
Hillis-Steele shifts cross lane boundaries of the tiled layout and every
step relayouts.  The AGC guess-verify solver calls it ~9 times per
flagship step, making the solve the chain's largest remaining cost
(DESIGN.md §19).  This kernel keeps everything in VMEM with the two
natural shift axes:

  1. in-row prefix: 7 Hillis-Steele steps of ``pltpu.roll`` along the
     128-lane axis (elements rolled in from the left masked to the
     identity (A=1, b=0));
  2. row-level prefix: extract each row's total (lane 127), run an
     8-step Hillis-Steele along the SUBLANE axis on the [R, 1] column,
     shift to an exclusive prefix, and apply it back to every row —
     fully vectorized, no sequential row loop;
  3. a scalar carry in SMEM chains the grid steps (the Mosaic grid is
     sequential), initialized from x0 at step 0.

Composition order note: the affine maps compose as (g∘f)(x) =
A_g·(A_f·x + b_f) + b_g, i.e. LATER elements multiply EARLIER prefixes:
prefix ← (A_l·A_{l-s}, A_l·b_{l-s} + b_l) with the rolled arrays playing
the earlier role.

Restrictions (the wrapper enforces/falls back):
  * f32, 1-D, N a multiple of 128 (wrapper pads with identity elements);
  * not vmapped (the SMEM carry is per-call; batched callers keep the
    XLA associative_scan) — use from single-stream paths only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cutesdr_tpu.kernels._cachefix  # noqa: F401  (cache-stable payloads)

ROWS_PER_STEP = 256          # (256, 128) f32 blocks = 128 KB per operand
MIN_KERNEL_N = 65536         # below this XLA's scan wins (pad waste + fixed
                             # cost); wrapper falls back


def _kernel(x0_ref, a_ref, b_ref, out_ref, carry_ref):
    rows = a_ref.shape[0]
    A = a_ref[:]
    B = b_ref[:]

    # 1. in-row (lane) inclusive prefix
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    for k in range(7):                       # 1, 2, 4, ..., 64
        s = 1 << k
        Ashift = pltpu.roll(A, shift=s, axis=1)
        Bshift = pltpu.roll(B, shift=s, axis=1)
        keep = lane >= s
        Aprev = jnp.where(keep, Ashift, 1.0)
        Bprev = jnp.where(keep, Bshift, 0.0)
        B = A * Bprev + B
        A = A * Aprev

    # 2. row totals -> exclusive row prefix along sublanes
    rowA = A[:, 127:128]                     # [rows, 1]
    rowB = B[:, 127:128]
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    pA, pB = rowA, rowB
    k = 0
    while (1 << k) < rows:
        s = 1 << k
        As = pltpu.roll(pA, shift=s, axis=0)
        Bs = pltpu.roll(pB, shift=s, axis=0)
        keep = srow >= s
        Aprev = jnp.where(keep, As, 1.0)
        Bprev = jnp.where(keep, Bs, 0.0)
        pB = pA * Bprev + pB
        pA = pA * Aprev
        k += 1
    # exclusive: shift down one row, row 0 = identity
    eA = jnp.where(srow >= 1, pltpu.roll(pA, shift=1, axis=0), 1.0)
    eB = jnp.where(srow >= 1, pltpu.roll(pB, shift=1, axis=0), 0.0)

    # 3. carry from previous grid step (x0 at step 0)
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[0] = x0_ref[0]
    s0 = carry_ref[0]

    start = eA * s0 + eB                     # x before each row, [rows, 1]
    out = A * start + B                      # broadcast over lanes
    out_ref[:] = out
    carry_ref[0] = out[rows - 1, 127]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_padded(a2, b2, x0, interpret=False):
    rows = a2.shape[0]
    grid = rows // ROWS_PER_STEP
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
            pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(x0.reshape(1), a2, b2)


def supported(n: int) -> bool:
    return n >= MIN_KERNEL_N


def use_kernel(a: jax.Array) -> bool:
    """Trace-time gate for the fast path: flat f32, large, on TPU.

    Callers must ALSO guarantee they are not under vmap (the SMEM carry
    is per-call; a batched pallas_call would re-init it only on batch 0)
    — hence the explicit ``fast=`` flags threaded from single-stream
    entry points rather than a blanket switch inside
    first_order_recurrence."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return (backend == "tpu" and a.ndim == 1
            and a.dtype == jnp.float32 and a.shape[-1] >= MIN_KERNEL_N)


def first_order_scan(a: jax.Array, b: jax.Array, x0,
                     interpret: bool = False) -> jax.Array:
    """x[n] = a[n]·x[n-1] + b[n] for flat f32 arrays (any length; padded
    internally with identity elements to a whole number of row blocks)."""
    n = a.shape[-1]
    block = ROWS_PER_STEP * 128
    pad = (-n) % block
    if pad:
        a = jnp.concatenate([a, jnp.ones((pad,), a.dtype)])
        b = jnp.concatenate([b, jnp.zeros((pad,), b.dtype)])
    rows = (n + pad) // 128
    out = _scan_padded(a.reshape(rows, 128), b.reshape(rows, 128),
                       jnp.asarray(x0, a.dtype), interpret=interpret)
    return out.reshape(rows * 128)[:n]


def _round_kernel(x0_ref, al_ref, pk_ref, pat_ref, out_ref, newpat_ref,
                  mism_ref, carry_ref):
    """One guess-verify round for the two-rate averager, fused:
    A/B from the branch pattern, the affine prefix solve, the shifted
    x[n-1] series, the re-derived pattern, and the harmless-mismatch
    forgiveness (exact ties and rounding-identical branch updates) — one
    kernel call instead of ~8 XLA passes per round (ops/agc.py)."""
    rows = pk_ref.shape[0]
    rise_a = al_ref[0]
    fall_a = al_ref[1]
    pk = pk_ref[:]
    pat = pat_ref[:] > 0.5
    A = jnp.where(pat, 1.0 - rise_a, 1.0 - fall_a)
    B = jnp.where(pat, rise_a, fall_a) * pk

    # affine prefix (same scheme as _kernel)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    for k in range(7):
        sft = 1 << k
        Ashift = pltpu.roll(A, shift=sft, axis=1)
        Bshift = pltpu.roll(B, shift=sft, axis=1)
        keep = lane >= sft
        Aprev = jnp.where(keep, Ashift, 1.0)
        Bprev = jnp.where(keep, Bshift, 0.0)
        B = A * Bprev + B
        A = A * Aprev
    rowA = A[:, 127:128]
    rowB = B[:, 127:128]
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    pA, pB = rowA, rowB
    k = 0
    while (1 << k) < rows:
        sft = 1 << k
        As = pltpu.roll(pA, shift=sft, axis=0)
        Bs = pltpu.roll(pB, shift=sft, axis=0)
        keep = srow >= sft
        pB = pA * jnp.where(keep, Bs, 0.0) + pB
        pA = pA * jnp.where(keep, As, 1.0)
        k += 1
    eA = jnp.where(srow >= 1, pltpu.roll(pA, shift=1, axis=0), 1.0)
    eB = jnp.where(srow >= 1, pltpu.roll(pB, shift=1, axis=0), 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[0] = x0_ref[0]
    s0 = carry_ref[0]
    start = eA * s0 + eB
    out = A * start + B
    out_ref[:] = out
    carry_ref[0] = out[rows - 1, 127]

    # x[n-1] series: flat shift right by one with the pre-update carry
    p1 = pltpu.roll(out, shift=1, axis=1)
    p2 = pltpu.roll(pltpu.roll(out, shift=1, axis=0), shift=1, axis=1)
    prev = jnp.where(lane > 0, p1, p2)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    prev = jnp.where((lane == 0) & (row == 0), s0, prev)

    newpat = pk > prev
    newpat_ref[:] = jnp.where(newpat, 1.0, 0.0)
    same_val = ((1.0 - rise_a) * prev + rise_a * pk
                == (1.0 - fall_a) * prev + fall_a * pk)
    mism = (newpat != pat) & (pk != prev) & jnp.logical_not(same_val)
    mism_ref[:] = jnp.where(mism, 1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _round_padded(pk2, pat2, x0, alphas, interpret=False):
    rows = pk2.shape[0]
    grid = rows // ROWS_PER_STEP
    return pl.pallas_call(
        _round_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
            pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
        ],
        out_specs=[pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
                   pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
                   pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 128), jnp.float32)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(x0.reshape(1), alphas, pk2, pat2)


def guess_round(peak: jax.Array, pattern: jax.Array, x0, rise_alpha,
                fall_alpha, interpret: bool = False):
    """(x, pattern_new, n_mismatch) for one fused guess-verify round of
    the two-rate averager (ops/agc._two_rate_parallel's loop body as ONE
    pallas_call: A/B branch selection, log-depth affine prefix solve,
    the x[n-1] shift, pattern re-derivation, and the exact-tie /
    branch-update-tie forgiveness).  ``pattern`` is f32 0/1 (Mosaic
    blocks carry floats; booleans are threaded as 0/1).  ``n_mismatch``
    counts only the REAL n elements; the block padding (peak extended
    with its last value, pattern with zeros) is sliced off before the
    reduce, so pad elements can never stall the caller's while_loop."""
    n = peak.shape[-1]
    block = ROWS_PER_STEP * 128
    pad = (-n) % block
    if pad:
        # constant continuation of the last peak keeps the padded
        # recurrence finite and stable; pad mismatches are sliced off
        # before the count regardless
        peak = jnp.concatenate(
            [peak, jnp.broadcast_to(peak[-1:], (pad,))])
        pattern = jnp.concatenate(
            [pattern, jnp.zeros((pad,), pattern.dtype)])
    rows = (n + pad) // 128
    al = jnp.stack([jnp.asarray(rise_alpha, jnp.float32),
                    jnp.asarray(fall_alpha, jnp.float32)])
    x, np_, mi = _round_padded(peak.reshape(rows, 128),
                               pattern.reshape(rows, 128),
                               jnp.asarray(x0, jnp.float32), al,
                               interpret=interpret)
    flat = lambda a: a.reshape(rows * 128)[:n]
    return flat(x), flat(np_), jnp.sum(mi.reshape(rows * 128)[:n])


_NEG = -3.0e38                           # max-affine identity third element


def _smeter_kernel(scal_ref, mag_ref, out_ref, carry_ref):
    """Fused S-meter block: BOTH averager recurrences of
    ops/smeter.process —

        a[n] = (1-aa)·a[n-1] + aa·m[n]                 (attack EMA)
        d[n] = max((1-ad)·d[n-1] + ad·m[n], a[n])      (snapped decay)

    — as two chained log-depth prefixes entirely in VMEM, emitting ONLY
    the two final values (the S-meter reads scalars; the full series is
    never consumed downstream).  The attack prefix is the affine algebra
    of _kernel; the decay is the max-affine algebra of
    ops/util.max_affine_recurrence, (c,u,v) composing as
    (c_l·c_r, c_r·u_l + u_r, max(c_r·v_l + u_r, v_r)) with identity
    (1, 0, -inf), where v is the attack series computed moments earlier.
    One pallas_call replaces two XLA associative scans (~1.0 ms -> ~0.1
    ms for 262k on v5e)."""
    rows = mag_ref.shape[0]
    mag = mag_ref[:]
    aa = scal_ref[2]
    ad = scal_ref[3]

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[0] = scal_ref[0]
        carry_ref[1] = scal_ref[1]
    a0 = carry_ref[0]
    d0 = carry_ref[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

    # ---- attack EMA: affine prefix (same scheme as _kernel) ----
    A = jnp.full((rows, 128), 1.0, jnp.float32) - aa
    B = aa * mag
    for k in range(7):
        s = 1 << k
        keep = lane >= s
        Aprev = jnp.where(keep, pltpu.roll(A, shift=s, axis=1), 1.0)
        Bprev = jnp.where(keep, pltpu.roll(B, shift=s, axis=1), 0.0)
        B = A * Bprev + B
        A = A * Aprev
    pA, pB = A[:, 127:128], B[:, 127:128]
    k = 0
    while (1 << k) < rows:
        s = 1 << k
        keep = srow >= s
        Aprev = jnp.where(keep, pltpu.roll(pA, shift=s, axis=0), 1.0)
        Bprev = jnp.where(keep, pltpu.roll(pB, shift=s, axis=0), 0.0)
        pB = pA * Bprev + pB
        pA = pA * Aprev
        k += 1
    eA = jnp.where(srow >= 1, pltpu.roll(pA, shift=1, axis=0), 1.0)
    eB = jnp.where(srow >= 1, pltpu.roll(pB, shift=1, axis=0), 0.0)
    a_series = A * (eA * a0 + eB) + B        # [rows, 128]

    # ---- snapped decay: max-affine prefix with v = a_series ----
    C = jnp.full((rows, 128), 1.0, jnp.float32) - ad
    U = ad * mag
    V = a_series
    for k in range(7):
        s = 1 << k
        keep = lane >= s
        Cprev = jnp.where(keep, pltpu.roll(C, shift=s, axis=1), 1.0)
        Uprev = jnp.where(keep, pltpu.roll(U, shift=s, axis=1), 0.0)
        Vprev = jnp.where(keep, pltpu.roll(V, shift=s, axis=1), _NEG)
        V = jnp.maximum(C * Vprev + U, V)
        U = C * Uprev + U
        C = C * Cprev
    pC, pU, pV = C[:, 127:128], U[:, 127:128], V[:, 127:128]
    k = 0
    while (1 << k) < rows:
        s = 1 << k
        keep = srow >= s
        Cprev = jnp.where(keep, pltpu.roll(pC, shift=s, axis=0), 1.0)
        Uprev = jnp.where(keep, pltpu.roll(pU, shift=s, axis=0), 0.0)
        Vprev = jnp.where(keep, pltpu.roll(pV, shift=s, axis=0), _NEG)
        pV = jnp.maximum(pC * Vprev + pU, pV)
        pU = pC * Uprev + pU
        pC = pC * Cprev
        k += 1
    eC = jnp.where(srow >= 1, pltpu.roll(pC, shift=1, axis=0), 1.0)
    eU = jnp.where(srow >= 1, pltpu.roll(pU, shift=1, axis=0), 0.0)
    eV = jnp.where(srow >= 1, pltpu.roll(pV, shift=1, axis=0), _NEG)
    d_start = jnp.maximum(eC * d0 + eU, eV)  # [rows, 1]
    d_series = jnp.maximum(C * d_start + U, V)

    a_last = a_series[rows - 1, 127]
    d_last = d_series[rows - 1, 127]
    carry_ref[0] = a_last
    carry_ref[1] = d_last
    out_ref[0] = a_last
    out_ref[1] = d_last


@functools.partial(jax.jit, static_argnames=("interpret",))
def _smeter_padless(mag2, scal, interpret=False):
    rows = mag2.shape[0]
    grid = rows // ROWS_PER_STEP
    return pl.pallas_call(
        _smeter_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS_PER_STEP, 128), lambda g: (g, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((2,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(scal, mag2)


def smeter_supported(n: int) -> bool:
    """The fused S-meter kernel emits only the final values, so the LAST
    input element must be a real sample — no identity padding is
    possible.  Require whole (ROWS_PER_STEP x 128) blocks."""
    return n >= MIN_KERNEL_N and n % (ROWS_PER_STEP * 128) == 0


def smeter_last(mag: jax.Array, attack_alpha, decay_alpha, a0, d0,
                interpret: bool = False):
    """(a_last, d_last) of the S-meter averager pair over ``mag``.
    Caller must check smeter_supported(len(mag)) and the use_kernel
    platform/dtype gates."""
    n = mag.shape[-1]
    rows = n // 128
    scal = jnp.stack([jnp.asarray(a0, jnp.float32),
                      jnp.asarray(d0, jnp.float32),
                      jnp.asarray(attack_alpha, jnp.float32),
                      jnp.asarray(decay_alpha, jnp.float32)])
    out = _smeter_padless(mag.reshape(rows, 128), scal,
                          interpret=interpret)
    return out[0], out[1]

