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
