"""Streaming FIR filters (real, and complex with separate I/Q tap sets).

Reference analogue: CFir's per-sample circular-buffer MAC loops
(dsp/fir.cpp:72-91 real, :101-127 complex).  Here a block is one batched
convolution with a carried (taps-1)-sample input tail:

    y[n] = sum_j h[j] * x[n-j]        (causal convolution)

The complex variant filters the I and Q planes independently with their own
real tap sets (hI, hQ) — identical plumbing to the reference, which is what
lets a Hilbert bandpass pair impose a 90° phase shift between planes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cutesdr_tpu.ops.util import strided_corr
from cutesdr_tpu.types import complex_zeros


class FirParams(NamedTuple):
    taps_i: jax.Array
    taps_q: jax.Array    # == taps_i for plain (non-Hilbert) complex filtering


class FirCarry(NamedTuple):
    tail: jax.Array      # [L-1] input history (complex or real)


def init(taps, taps_q=None, complex_input: bool = False,
         rdtype=jnp.float32) -> tuple[FirParams, FirCarry]:
    ti = jnp.asarray(taps, rdtype)
    tq = ti if taps_q is None else jnp.asarray(taps_q, rdtype)
    dt = jnp.zeros((), rdtype)
    tail_dtype = jax.lax.complex(dt, dt).dtype if complex_input else rdtype
    return (FirParams(taps_i=ti, taps_q=tq),
            FirCarry(tail=complex_zeros(ti.shape[0] - 1, tail_dtype)))


def process_real(params: FirParams, carry: FirCarry,
                 x: jax.Array) -> tuple[FirCarry, jax.Array]:
    L = params.taps_i.shape[0]
    z = jnp.concatenate([carry.tail, x], axis=-1)
    y = strided_corr(z, params.taps_i[::-1])     # flip: true convolution
    return FirCarry(tail=z[..., z.shape[-1] - (L - 1):]), y


def process_complex(params: FirParams, carry: FirCarry,
                    x: jax.Array) -> tuple[FirCarry, jax.Array]:
    L = params.taps_i.shape[0]
    z = jnp.concatenate([carry.tail, x], axis=-1)
    yi = strided_corr(z.real, params.taps_i[::-1])
    yq = strided_corr(z.imag, params.taps_q[::-1])
    y = jax.lax.complex(yi, yq)
    return FirCarry(tail=z[..., z.shape[-1] - (L - 1):]), y
