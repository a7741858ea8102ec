"""Config-space fuzz: random valid receiver configurations must build,
run, and produce finite audio."""

import jax.numpy as jnp
import numpy as np
import pytest

from cutesdr_tpu.pipeline.receiver import (MODE_LIMITS, Receiver,
                                           ReceiverConfig)
from cutesdr_tpu.testbench.generators import tone

RATES = [196608.0, 250_000.0, 500_000.0, 614_400.0, 1_234_567.0, 2_000_000.0]


def _random_cfg(rng) -> ReceiverConfig:
    mode = rng.choice(list(MODE_LIMITS))
    hi_min, hi_max, low_min, low_max, _ = MODE_LIMITS[mode]
    hi = float(rng.uniform(hi_min, hi_max))
    lo = float(rng.uniform(low_min, min(low_max, hi - 50.0)))
    return ReceiverConfig(
        input_rate=float(rng.choice(RATES)),
        mode=mode, low_cut=lo, hi_cut=hi,
        tune_freq=float(rng.uniform(-0.3, 0.3)) * 100_000.0,
        agc_on=bool(rng.integers(2)),
        agc_hang=bool(rng.integers(2)),
        agc_thresh_db=float(rng.uniform(-140, -20)),
        agc_decay_ms=float(rng.uniform(20, 2000)),
        nb_on=bool(rng.integers(2)),
        squelch_ui=int(rng.integers(0, 99)),   # 99 would force mute
        stereo=bool(rng.integers(2)),
        audio_rate=48000.0 if rng.integers(2) else None,
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_config_runs(seed):
    rng = np.random.default_rng(seed + 1000)
    cfg = _random_cfg(rng)
    rx = Receiver(cfg)
    x = tone(cfg.block_size, cfg.tune_freq + 500.0, cfg.input_rate, -25.0)
    x = x + (rng.standard_normal(cfg.block_size)
             + 1j * rng.standard_normal(cfg.block_size)) * 10.0
    out = rx.process(jnp.asarray(x, jnp.complex64))
    audio = np.asarray(out.audio)
    assert np.all(np.isfinite(audio)), cfg
    assert np.isfinite(float(out.smeter_ave_db)), cfg
    assert 0 <= int(out.n_audio) <= audio.shape[-1], cfg
