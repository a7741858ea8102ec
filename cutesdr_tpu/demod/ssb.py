"""SSB / CW demodulator.

Reference analogue: CSsbDemod (dsp/ssbdemod.cpp:48-60) — the channel filter
has already selected the sideband as a complex passband and the CW offset is
applied by the downconverter, so demodulation is just taking the real part
(and duplicating it for stereo).
"""

from __future__ import annotations

import jax


def process(carry: None, x: jax.Array) -> tuple[None, jax.Array]:
    return carry, x.real


def process_stereo(carry: None, x: jax.Array) -> tuple[None, jax.Array]:
    return carry, jax.lax.complex(x.real, x.real)
