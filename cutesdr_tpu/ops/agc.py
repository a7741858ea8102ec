"""Digital AGC with delayed signal path, window peak detector, dual
attack/decay averagers and knee/slope gain law.

Reference analogue: CAgc (dsp/agc.cpp).  Structure (complex and real paths
share everything but the magnitude estimate, :174-296 / :301-401):

  1. signal delay line (15 ms) so gain leads the signal,
  2. log magnitude  log10(max(|I|,|Q|) + K_MIN) - log10(32767)  in decades
     (0 = full scale, -8 = -160 dB),
  3. 18 ms sliding-window peak  — here a parallel ``reduce_window`` max
     instead of the reference's branch-heavy O(W) rescan (:209-231),
  4. attack & decay exponential averagers with separate rise/fall constants
     (optionally a hang-timer release mode) — a cheap audio-rate lax.scan,
  5. gain law: fixed gain below the knee, 10^(mag*(slope-1)) above, output
     scaled to ~3 dB below max (AGC_OUTSCALE).

AGC on/off and hang mode are *static* (they change program structure); the
numeric parameters are traced so the UI can slide them without recompiling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cutesdr_tpu.ops.util import sliding_window_max
from cutesdr_tpu.types import MAX_AMPLITUDE, complex_zeros

DELAY_TIMECONST = 0.015
WINDOW_TIMECONST = 0.018
ATTACK_RISE_TIMECONST = 0.002
ATTACK_FALL_TIMECONST = 0.005
DECAY_RISEFALL_RATIO = 0.3
RELEASE_TIMECONST = 0.05
AGC_OUTSCALE = 0.7
MIN_CONSTANT = 3.2767e-4      # log10(0 + K) - log10(32767) == -8 (-160 dB)
MAX_DELAY_SAMPLES = 2047


@dataclass(frozen=True)
class AgcConfig:
    """Static structure: determines delay/window sizes and scan shape."""
    agc_on: bool
    use_hang: bool
    sample_rate: float

    @property
    def delay_samples(self) -> int:
        return min(int(self.sample_rate * DELAY_TIMECONST), MAX_DELAY_SAMPLES)

    @property
    def window_samples(self) -> int:
        return int(self.sample_rate * WINDOW_TIMECONST)


class AgcParams(NamedTuple):
    knee: jax.Array            # thresh_dB / 20 (decades)
    gain_slope: jax.Array      # slope / 100
    fixed_gain: jax.Array
    manual_gain: jax.Array
    attack_rise_alpha: jax.Array
    attack_fall_alpha: jax.Array
    decay_rise_alpha: jax.Array
    decay_fall_alpha: jax.Array
    hang_time: jax.Array       # samples (int32)


class AgcCarry(NamedTuple):
    sig_delay: jax.Array       # [delay_samples] input history
    mag_tail: jax.Array        # [window_samples-1] magnitude history
    attack_ave: jax.Array
    decay_ave: jax.Array
    hang_timer: jax.Array      # int32


def make_params(cfg: AgcConfig, threshold_db: float, manual_gain_db: float,
                slope_factor: float, decay_ms: float,
                rdtype=jnp.float32) -> AgcParams:
    fs = cfg.sample_rate
    knee = threshold_db / 20.0
    gain_slope = slope_factor / 100.0
    fixed_gain = AGC_OUTSCALE * 10.0 ** (knee * (gain_slope - 1.0))
    manual = MAX_AMPLITUDE * 10.0 ** (-(100.0 - manual_gain_db) / 20.0)
    a_rise = 1.0 - np.exp(-1.0 / (fs * ATTACK_RISE_TIMECONST))
    a_fall = 1.0 - np.exp(-1.0 / (fs * ATTACK_FALL_TIMECONST))
    d_rise = 1.0 - np.exp(-1.0 / (fs * decay_ms * 1e-3 * DECAY_RISEFALL_RATIO))
    if cfg.use_hang:
        d_fall = 1.0 - np.exp(-1.0 / (fs * RELEASE_TIMECONST))
    else:
        d_fall = 1.0 - np.exp(-1.0 / (fs * decay_ms * 1e-3))
    hang_time = int(fs * decay_ms * 1e-3)
    r = lambda v: jnp.asarray(v, rdtype)
    return AgcParams(knee=r(knee), gain_slope=r(gain_slope),
                     fixed_gain=r(fixed_gain), manual_gain=r(manual),
                     attack_rise_alpha=r(a_rise), attack_fall_alpha=r(a_fall),
                     decay_rise_alpha=r(d_rise), decay_fall_alpha=r(d_fall),
                     hang_time=jnp.asarray(hang_time, jnp.int32))


def init_carry(cfg: AgcConfig, complex_input: bool,
               rdtype=jnp.float32) -> AgcCarry:
    zero = jnp.zeros((), rdtype)
    sig_dtype = jax.lax.complex(zero, zero).dtype if complex_input else rdtype
    return AgcCarry(
        sig_delay=complex_zeros(cfg.delay_samples, sig_dtype),
        mag_tail=jnp.full(cfg.window_samples - 1, -16.0, rdtype),
        attack_ave=jnp.asarray(-5.0, rdtype),
        decay_ave=jnp.asarray(-5.0, rdtype),
        hang_timer=jnp.zeros((), jnp.int32))


def _averager_scan(cfg: AgcConfig, p: AgcParams, carry: AgcCarry,
                   peak: jax.Array):
    """Audio-rate scan over the peak sequence producing max(attack, decay)."""

    def step(c, pk):
        a, d, timer = c
        a_alpha = jnp.where(pk > a, p.attack_rise_alpha, p.attack_fall_alpha)
        a_new = (1.0 - a_alpha) * a + a_alpha * pk
        if cfg.use_hang:
            rising = pk > d
            d_rise = (1.0 - p.decay_rise_alpha) * d + p.decay_rise_alpha * pk
            d_fall = (1.0 - p.decay_fall_alpha) * d + p.decay_fall_alpha * pk
            hold = timer < p.hang_time
            d_new = jnp.where(rising, d_rise, jnp.where(hold, d, d_fall))
            timer = jnp.where(rising, 0, jnp.where(hold, timer + 1, timer))
        else:
            d_alpha = jnp.where(pk > d, p.decay_rise_alpha, p.decay_fall_alpha)
            d_new = (1.0 - d_alpha) * d + d_alpha * pk
        return (a_new, d_new, timer), jnp.maximum(a_new, d_new)

    (a, d, timer), mag = lax.scan(
        step, (carry.attack_ave, carry.decay_ave, carry.hang_timer), peak)
    return a, d, timer, mag


def process(cfg: AgcConfig, params: AgcParams, carry: AgcCarry,
            x: jax.Array) -> tuple[AgcCarry, jax.Array]:
    if not cfg.agc_on:
        return carry, params.manual_gain * x

    n = x.shape[-1]
    rdtype = jnp.real(x).dtype

    zd = jnp.concatenate([carry.sig_delay, x], axis=-1)
    delayed = zd[..., :n]
    new_sig_delay = zd[..., n:]

    if jnp.iscomplexobj(x):
        inst = jnp.maximum(jnp.abs(x.real), jnp.abs(x.imag))
    else:
        inst = jnp.abs(x)
    mag = jnp.log10(inst + MIN_CONSTANT) - np.log10(MAX_AMPLITUDE)
    mag = mag.astype(rdtype)

    peak, mag_tail = sliding_window_max(mag, cfg.window_samples, carry.mag_tail)
    a, d, timer, magsel = _averager_scan(cfg, params, carry, peak)

    gain = jnp.where(magsel <= params.knee, params.fixed_gain,
                     AGC_OUTSCALE * 10.0 ** (magsel * (params.gain_slope - 1.0)))
    y = delayed * gain.astype(rdtype)
    return AgcCarry(sig_delay=new_sig_delay, mag_tail=mag_tail,
                    attack_ave=a, decay_ave=d, hang_timer=timer), y
