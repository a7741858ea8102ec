"""Scalar-core sequential PLL loops (the exact-fallback accelerator).

Why a kernel: a `lax.scan` whose body is a handful of scalar ops costs
~2.8 us/iteration on v5e (each iteration round-trips the serialized VPU
pipeline; `unroll` only buys ~2x — CLAUDE.md).  The FM/SAM sequential
fallbacks — the EXACT per-sample reference recurrences
(dsp/fmdemod.cpp:62-89, dsp/samdemod.cpp:78-110) taken during acquisition
or on carrier-less noise — therefore dominated their blocks: ~23 ms for
an 8k-sample FM block that the rest of the chain finishes in ~0.3 ms.

A TPU core also has a SCALAR processor (the unit that sequences the
vector pipelines, runs control flow and SMEM arithmetic).  This kernel
runs the identical recurrence as a `fori_loop` of pure scalar f32 ops —
per-sample cost is a few pipeline-visible cycles instead of a VPU
round-trip.  Measured r5 on v5e (D2H-slope fence): 8192-sample FM block
23 ms -> ~0.2 ms (~100x); SAM similar.

Semantics: bit-for-bit the same arithmetic as the XLA scan bodies in
demod/fm._pll_scan and demod/sam._pll_scan (same wrap expression
`e - 2pi*round(e/2pi)`, same clip, same update order).  FMA contraction
may still differ between the two compilers, so cross-implementation
equality is asserted at f32-roundoff tolerance, not bitwise
(tests/test_kernels.py; the golden/refgold bounds are the system-level
guard).

Restrictions (wrapper enforces / caller gates):
  * f32 scalars, single stream — the SMEM state is per-call, so NOT
    vmappable: thread explicit fast= flags from single-stream call
    sites only (same contract as kernels/scan1).
  * n padded to whole (8, 128) tiles host-side; the loop runs exactly n
    iterations and the pad region is sliced off.
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

MIN_KERNEL_N = 512      # below this the XLA scan's ~2.8us/iter still beats
                        # the pallas_call fixed cost


def use_kernel(theta: jax.Array) -> bool:
    """Trace-time gate: flat f32 on TPU, big enough to beat the fixed
    cost.  Callers must ALSO be single-stream (no vmap — SMEM state)."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return (backend == "tpu" and theta.ndim == 1
            and theta.dtype == jnp.float32
            and theta.shape[-1] >= MIN_KERNEL_N)


def _wrap(e):
    """Scalar form of demod _wrap_pi: e - 2pi*round(e/2pi)."""
    two_pi = jnp.float32(K_2PI)
    return e - two_pi * jnp.round(e / two_pi)


def _fm_kernel(n: int, scal_ref, th_ref, audio_ref, err_ref, state_ref):
    alpha = scal_ref[0]
    beta = scal_ref[1]
    limit = scal_ref[2]
    gain = scal_ref[3]
    dca = scal_ref[4]

    def body(i, st):
        phase, freq, dc = st
        r = i // 128
        c = i % 128
        th = th_ref[r, c]
        err = -_wrap(th + phase)
        freq = jnp.clip(freq + beta * err, -limit, limit)
        phase = _wrap(phase + freq + alpha * err)
        dc = (1.0 - dca) * dc + dca * freq
        audio_ref[r, c] = (freq - dc) * gain
        err_ref[r, c] = err
        return (phase, freq, dc)

    phase, freq, dc = lax.fori_loop(
        0, n, body, (scal_ref[5], scal_ref[6], scal_ref[7]))
    state_ref[0] = jnp.mod(phase, jnp.float32(K_2PI))
    state_ref[1] = freq
    state_ref[2] = dc


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _fm_padded(n, scal, th2, interpret=False):
    rows = th2.shape[0]
    return pl.pallas_call(
        functools.partial(_fm_kernel, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((3,), jnp.float32)],
        interpret=interpret,
    )(scal, th2)


def _pad_rows(theta: jax.Array) -> jax.Array:
    n = theta.shape[-1]
    pad = (-n) % (8 * 128)
    if pad:
        theta = jnp.concatenate([theta, jnp.zeros((pad,), theta.dtype)])
    return theta.reshape(-1, 128)


def fm_pll_scan(alpha, beta, limit, out_gain, dc_alpha, phase0, freq0, dc0,
                theta: jax.Array, interpret: bool = False):
    """The FM PLL + DC-tracker recurrence (demod/fm._pll_scan's body) as
    a scalar-core loop.  Returns (phase', freq', dc', audio, err) with the
    same conventions as _pll_scan (phase' already mod 2pi)."""
    n = theta.shape[-1]
    scal = jnp.stack([jnp.asarray(v, jnp.float32) for v in
                      (alpha, beta, limit, out_gain, dc_alpha,
                       phase0, freq0, dc0)])
    audio, err, st = _fm_padded(n, scal, _pad_rows(theta),
                                interpret=interpret)
    flat = lambda a: a.reshape(-1)[:n]
    return st[0], st[1], st[2], flat(audio), flat(err)


def _sam_kernel(n: int, scal_ref, th_ref, prev_ref, state_ref):
    alpha = scal_ref[0]
    beta = scal_ref[1]
    limit = scal_ref[2]

    def body(i, st):
        phase, freq = st
        r = i // 128
        c = i % 128
        th = th_ref[r, c]
        err = _wrap(th - phase)
        freq = jnp.clip(freq + beta * err, -limit, limit)
        prev_ref[r, c] = phase              # pre-update phase (rotation)
        phase = _wrap(phase + freq + alpha * err)
        return (phase, freq)

    phase, freq = lax.fori_loop(0, n, body, (scal_ref[3], scal_ref[4]))
    state_ref[0] = jnp.mod(phase, jnp.float32(K_2PI))
    state_ref[1] = freq


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _sam_padded(n, scal, th2, interpret=False):
    rows = th2.shape[0]
    return pl.pallas_call(
        functools.partial(_sam_kernel, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.float32)],
        interpret=interpret,
    )(scal, th2)


def sam_pll_scan(alpha, beta, limit, phase0, freq0, theta: jax.Array,
                 interpret: bool = False):
    """The SAM carrier PLL recurrence (demod/sam._pll_scan's body) as a
    scalar-core loop.  Returns (phase', freq', prev_phases) where
    prev_phases is the PRE-update phase sequence the baseband rotation
    uses (exact reference parity, dsp/samdemod.cpp:78-110)."""
    n = theta.shape[-1]
    scal = jnp.stack([jnp.asarray(v, jnp.float32) for v in
                      (alpha, beta, limit, phase0, freq0)])
    prev, st = _sam_padded(n, scal, _pad_rows(theta), interpret=interpret)
    return st[0], st[1], prev.reshape(-1)[:n]
