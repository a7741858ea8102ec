"""Scalar-core sequential PLL loops (the exact-fallback accelerator).

Why a kernel: a `lax.scan` whose body is a handful of scalar ops costs
~2.8 us/iteration on v5e (each iteration round-trips the serialized VPU
pipeline; `unroll` only buys ~2x — CLAUDE.md).  The FM/SAM sequential
fallbacks — the EXACT per-sample reference recurrences
(dsp/fmdemod.cpp:62-89, dsp/samdemod.cpp:78-110) taken during acquisition
or on carrier-less noise — therefore dominated their blocks: several ms
for an 8k-sample block that the rest of the chain finishes in ~0.3 ms.

A TPU core also has a SCALAR processor (the unit that sequences the
vector pipelines, runs control flow and SMEM arithmetic).  This kernel
runs the identical recurrence as a `fori_loop` of scalar f32 ops plus
one (8, 128) mask-select per emitted series.  Measured r5 on v5e
(8192-sample blocks, D2H-slope fence, quiet host): FM 5.09 -> 1.37 ms
(3.7x, 167 ns/sample), SAM 3.41 -> 1.15 ms (3.0x, 140 ns/sample).  The
remaining floor is the masked output select + the serialized scalar ops;
a select-free variant via SMEM staging measured 10x SLOWER (scalar SMEM
array stores are expensive), and scalar round/div 3x slower — both kept
out by measurement.

Mosaic legality notes (r5, found by the on-chip sweep):
  * scalars canNOT be stored to VMEM ("Cannot store scalars to VMEM"),
    and output block shapes must obey the (8, 128) rule — so per-sample
    outputs are accumulated into an (8, 128) vector tile via a 2-D mask
    select and stored ONE TILE (1024 samples) PER GRID STEP; the grid is
    sequential on TPU, so an SMEM state carry chains exactly (same
    pattern as kernels/scan1);
  * the input lives in SMEM (scalar memory) where dynamic scalar reads
    are native; block sizes are capped so theta fits (use_kernel).

Semantics: the same arithmetic as the XLA scan bodies in
demod/fm._pll_scan and demod/sam._pll_scan (same wrap expression
`e - 2pi*round(e/2pi)`, same clip, same update order).  FMA contraction
may differ between compilers, so cross-implementation equality is
asserted at f32-roundoff tolerance, not bitwise (tests/test_kernels.py;
the golden/refgold bounds are the system-level guard).

Restrictions (wrapper enforces / caller gates):
  * f32, single stream — the SMEM carry is per-call, NOT vmappable:
    thread explicit fast= flags from single-stream call sites only
    (same contract as kernels/scan1);
  * n a multiple of 1024 and <= MAX_KERNEL_N (SMEM residency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cutesdr_tpu.kernels._cachefix  # noqa: F401  (cache-stable payloads)

from cutesdr_tpu.types import K_2PI

MIN_KERNEL_N = 1024     # one (8, 128) output tile; below this the XLA
                        # scan's ~2.8us/iter beats the pallas_call cost
MAX_KERNEL_N = 32768    # theta must fit in SMEM (128 KB f32 here)
LANE = 128
TILE = 8 * LANE         # samples per grid step: output rows must obey the
                        # (8, 128) Mosaic block-shape rule, so each step
                        # fills one whole (8, 128) tile


def use_kernel(theta: jax.Array) -> bool:
    """Trace-time gate: flat f32 on TPU, whole 128-lane rows, SMEM-sized.
    Callers must ALSO be single-stream (no vmap — SMEM state)."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    n = theta.shape[-1] if theta.ndim else 0
    return (backend == "tpu" and theta.ndim == 1
            and theta.dtype == jnp.float32
            and MIN_KERNEL_N <= n <= MAX_KERNEL_N and n % TILE == 0)


def _wrap(e, times: int = 1):
    """Conditional-subtract wrap into [-pi, pi] - `times` repetitions
    cover |e| < (2*times + 1)*pi.  The demods' _wrap_pi uses
    e - 2pi*round(e/2pi); scalar round/divide measured 231 ns/sample on
    v5e (it bounces through the vector unit) vs 76 ns for the whole loop
    with this form.  Equivalent to the round form for |e| in range except
    exactly AT odd multiples of pi (round-half-even keeps -pi; the strict
    < below does too) - any divergence is measure-zero in f32."""
    two_pi = jnp.float32(K_2PI)
    pi = jnp.float32(K_2PI / 2.0)
    for _ in range(times):
        e = jnp.where(e > pi, e - two_pi, e)
        e = jnp.where(e < -pi, e + two_pi, e)
    return e


def _fm_kernel(scal_ref, th_ref, freq_ref, err_ref, state_ref, carry_ref):
    """Emits the FREQUENCY and phase-error series; the DC tracker and
    audio scaling are linear post-processing the caller runs vectorized
    (demod/fm._dc_track — the offset-frame EMA, which is also the better
    f32 formulation), keeping the serial loop to the loop-critical ops."""
    alpha = scal_ref[0]
    beta = scal_ref[1]
    limit = scal_ref[2]
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[0] = scal_ref[3]
        carry_ref[1] = scal_ref[4]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    flat = row * LANE + lane
    ztile = jnp.zeros((8, LANE), jnp.float32)

    def body(i, st):
        phase, freq, tf, te = st
        th = th_ref[g * TILE + i]
        # th, phase in (-pi, pi] -> |th + phase| < 2pi: one wrap pass
        err = -_wrap(th + phase)
        freq = jnp.clip(freq + beta * err, -limit, limit)
        # |phase + freq + alpha*err| < pi + limit + alpha*pi < 7pi at
        # every reachable FM rate (alpha <= 3.4 at the 15.8 kHz floor)
        phase = _wrap(phase + freq + alpha * err, times=3)
        put = flat == i
        tf = jnp.where(put, freq, tf)
        te = jnp.where(put, err, te)
        return (phase, freq, tf, te)

    phase, freq, tf, te = lax.fori_loop(
        0, TILE, body, (carry_ref[0], carry_ref[1], ztile, ztile))
    freq_ref[:, :] = tf
    err_ref[:, :] = te
    carry_ref[0] = phase
    carry_ref[1] = freq
    state_ref[0] = jnp.mod(phase, jnp.float32(K_2PI))
    state_ref[1] = freq


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fm_call(scal, theta, interpret=False):
    n = theta.shape[-1]
    rows = n // LANE
    return pl.pallas_call(
        _fm_kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((8, LANE), lambda g: (g, 0)),
                   pl.BlockSpec((8, LANE), lambda g: (g, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.float32)],
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(scal, theta)


def fm_pll_scan(alpha, beta, limit, phase0, freq0,
                theta: jax.Array, interpret: bool = False):
    """The FM PLL recurrence (demod/fm._pll_scan's loop body minus the
    linear DC tracker, which the caller runs vectorized via _dc_track) as
    a scalar-core loop.  Returns (phase', freq', freqs, err): the final
    state (phase already mod 2pi), the per-sample NCO frequency series,
    and the phase-error series (the P6 probe)."""
    n = theta.shape[-1]
    if n % TILE:
        raise ValueError(f"n={n} must be a multiple of {TILE}")
    scal = jnp.stack([jnp.asarray(v, jnp.float32) for v in
                      (alpha, beta, limit, phase0, freq0)])
    freqs, err, st = _fm_call(scal, theta, interpret=interpret)
    return st[0], st[1], freqs.reshape(-1), err.reshape(-1)


def _sam_kernel(scal_ref, th_ref, prev_ref, state_ref, carry_ref):
    alpha = scal_ref[0]
    beta = scal_ref[1]
    limit = scal_ref[2]
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[0] = scal_ref[3]
        carry_ref[1] = scal_ref[4]

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    flat = row * LANE + lane
    ztile = jnp.zeros((8, LANE), jnp.float32)

    def body(i, st):
        phase, freq, tp = st
        th = th_ref[g * TILE + i]
        err = _wrap(th - phase)
        freq = jnp.clip(freq + beta * err, -limit, limit)
        tp = jnp.where(flat == i, phase, tp)        # pre-update phase
        # SAM loop gain is tiny (alpha ~ 0.014): two passes for margin
        phase = _wrap(phase + freq + alpha * err, times=2)
        return (phase, freq, tp)

    phase, freq, tp = lax.fori_loop(
        0, TILE, body, (carry_ref[0], carry_ref[1], ztile))
    prev_ref[:, :] = tp
    carry_ref[0] = phase
    carry_ref[1] = freq
    state_ref[0] = jnp.mod(phase, jnp.float32(K_2PI))
    state_ref[1] = freq


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sam_call(scal, theta, interpret=False):
    n = theta.shape[-1]
    rows = n // LANE
    return pl.pallas_call(
        _sam_kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((8, LANE), lambda g: (g, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.float32)],
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(scal, theta)


def sam_pll_scan(alpha, beta, limit, phase0, freq0, theta: jax.Array,
                 interpret: bool = False):
    """The SAM carrier PLL recurrence (demod/sam._pll_scan's body) as a
    scalar-core loop.  Returns (phase', freq', prev_phases) where
    prev_phases is the PRE-update phase sequence the baseband rotation
    uses (exact reference parity, dsp/samdemod.cpp:78-110)."""
    n = theta.shape[-1]
    if n % TILE:
        raise ValueError(f"n={n} must be a multiple of {TILE}")
    scal = jnp.stack([jnp.asarray(v, jnp.float32) for v in
                      (alpha, beta, limit, phase0, freq0)])
    prev, st = _sam_call(scal, theta, interpret=interpret)
    return st[0], st[1], prev.reshape(-1)
