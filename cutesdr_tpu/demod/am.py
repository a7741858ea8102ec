"""AM envelope demodulator.

Reference analogue: CAmDemod (dsp/amdemod.cpp): magnitude envelope
sqrt(I²+Q²), one-pole DC-removal highpass H(z) = (1-z⁻¹)/(1-0.99·z⁻¹), then
a post lowpass FIR at the main filter's half-bandwidth (Kaiser, 50 dB,
transition to 1.8×BW) to limit HF noise.

The DC filter's pole recurrence is solved with a parallel first-order
recurrence (log-depth associative scan) instead of a serial loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cutesdr_tpu.design.fir_kaiser import design_lowpass
from cutesdr_tpu.ops import fir
from cutesdr_tpu.ops.util import first_order_recurrence

DC_ALPHA = 0.99


class AmParams(NamedTuple):
    post_fir: fir.FirParams


class AmCarry(NamedTuple):
    z1: jax.Array               # DC-removal filter state
    post_fir: fir.FirCarry


def init(bandwidth: float, sample_rate: float,
         rdtype=jnp.float32) -> tuple[AmParams, AmCarry]:
    taps = design_lowpass(1.0, 50.0, bandwidth, bandwidth * 1.8, sample_rate)
    fp, fc = fir.init(taps, rdtype=rdtype)
    return (AmParams(post_fir=fp),
            AmCarry(z1=jnp.zeros((), rdtype), post_fir=fc))


def set_bandwidth(params: AmParams, bandwidth: float,
                  sample_rate: float) -> AmParams:
    taps = design_lowpass(1.0, 50.0, bandwidth, bandwidth * 1.8, sample_rate)
    return AmParams(post_fir=params.post_fir._replace(
        taps_i=jnp.asarray(taps, params.post_fir.taps_i.dtype),
        taps_q=jnp.asarray(taps, params.post_fir.taps_q.dtype)))


def _envelope_dc(carry_z1, x):
    mag = jnp.abs(x)    # sqrt(I^2+Q^2)
    # z0[n] = mag[n] + DC_ALPHA*z0[n-1];  y[n] = z0[n] - z0[n-1]
    z0 = first_order_recurrence(DC_ALPHA, mag, carry_z1)
    z_prev = jnp.concatenate([carry_z1[None], z0[:-1]], axis=-1)
    return z0[-1], z0 - z_prev


def process(params: AmParams, carry: AmCarry,
            x: jax.Array) -> tuple[AmCarry, jax.Array]:
    z1, y = _envelope_dc(carry.z1, x)
    fc, y = fir.process_real(params.post_fir, carry.post_fir, y)
    return AmCarry(z1=z1, post_fir=fc), y


def process_stereo(params: AmParams, carry: AmCarry,
                   x: jax.Array) -> tuple[AmCarry, jax.Array]:
    carry, y = process(params, carry, x)
    return carry, jax.lax.complex(y, y)
