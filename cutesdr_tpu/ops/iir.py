"""Biquad IIR filter (direct form 2) as a scan over the 2-tap recurrence.

Reference analogue: CIir::ProcessFilter (dsp/iir.cpp:171-201).  The recurrence
is inherently serial but only runs at the decimated audio rate (≤48 kSPS), so
a lax.scan per block is cheap; the w1/w2 state carries across blocks.

    w0 = x[n] - a1*w1 - a2*w2
    y[n] = b0*w0 + b1*w1 + b2*w2 ;  w2 <- w1 ; w1 <- w0
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from cutesdr_tpu.design.iir_biquad import Biquad


class IirParams(NamedTuple):
    b0: jax.Array
    b1: jax.Array
    b2: jax.Array
    a1: jax.Array
    a2: jax.Array


class IirCarry(NamedTuple):
    w1: jax.Array   # scalar for real, or complex pair handled via dtype
    w2: jax.Array


def init(coefs: Biquad, complex_input: bool = False,
         rdtype=jnp.float32) -> tuple[IirParams, IirCarry]:
    b0, b1, b2, a1, a2 = (jnp.asarray(c, rdtype) for c in coefs)
    zero = jnp.zeros((), rdtype)
    if complex_input:
        zero = jax.lax.complex(zero, zero)
    return IirParams(b0, b1, b2, a1, a2), IirCarry(w1=zero, w2=zero)


def process(params: IirParams, carry: IirCarry,
            x: jax.Array) -> tuple[IirCarry, jax.Array]:
    """Works elementwise for real or complex x (complex filters each plane
    with the same real coefficients, as the reference's complex overload)."""
    b0, b1, b2, a1, a2 = params

    def step(c, xn):
        w1, w2 = c
        w0 = xn - a1 * w1 - a2 * w2
        y = b0 * w0 + b1 * w1 + b2 * w2
        return (w0, w1), y

    (w1, w2), y = lax.scan(step, (carry.w1, carry.w2), x)
    return IirCarry(w1=w1, w2=w2), y
