"""Display FFT path tests: absolute dB calibration, averaging behavior,
overload flag, bin->pixel screen mapping."""

import jax.numpy as jnp
import numpy as np
import pytest

from cutesdr_tpu.pipeline import spectrum as sp
from cutesdr_tpu.testbench.generators import tone


def _feed_tone(cfg, n_frames=3, power_db=0.0, freq=100_000.0, state=None):
    state = sp.init(cfg, jnp.float64) if state is None else state
    x = tone(cfg.fft_size * n_frames, freq, cfg.sample_rate, power_db)
    ov = False
    for f in range(n_frames):
        state, o = sp.accumulate(cfg, state,
                                 jnp.asarray(x[f * cfg.fft_size:
                                               (f + 1) * cfg.fft_size]))
        ov = ov or bool(o)
    return state, ov


def test_full_scale_tone_reads_zero_db():
    """A 0 dBFS tone with the Hann window must read ~0 dB absolute
    (the reference's K_B/K_C calibration makes N, window gain, and the
    32767 full scale cancel)."""
    cfg = sp.SpectrumConfig(fft_size=2048, ave_size=1, sample_rate=1e6)
    state, ov = _feed_tone(cfg, power_db=0.0, freq=250_000.0)
    db = np.asarray(sp.db_spectrum(cfg, state)) * 10.0
    peak_bin = int(np.argmax(db))
    f_peak = (peak_bin - cfg.fft_size // 2) * cfg.sample_rate / cfg.fft_size
    assert abs(f_peak - 250_000.0) < 2 * cfg.sample_rate / cfg.fft_size
    assert abs(db[peak_bin]) < 1.0          # ~0 dB
    # -40 dBFS tone reads -40
    state2, _ = _feed_tone(cfg, power_db=-40.0, freq=250_000.0)
    db2 = np.asarray(sp.db_spectrum(cfg, state2)) * 10.0
    assert abs(db2[int(np.argmax(db2))] + 40.0) < 1.0


def test_noise_floor_at_min():
    cfg = sp.SpectrumConfig(fft_size=512, sample_rate=1e6)
    state = sp.init(cfg, jnp.float64)
    state, _ = sp.accumulate(cfg, state, jnp.zeros(512, jnp.complex128))
    db = np.asarray(sp.db_spectrum(cfg, state)) * 10.0
    np.testing.assert_allclose(db, sp.K_MINDB, atol=0.5)


def test_overload_flag():
    cfg = sp.SpectrumConfig(fft_size=512, sample_rate=1e6)
    state = sp.init(cfg, jnp.float64)
    x = np.full(512, 32500.0 + 0.0j)
    state, ov = sp.accumulate(cfg, state, jnp.asarray(x))
    assert bool(ov)


def test_averaging_reduces_noise_variance(rng):
    cfg_ave = sp.SpectrumConfig(fft_size=512, ave_size=16, sample_rate=1e6)
    cfg_one = sp.SpectrumConfig(fft_size=512, ave_size=1, sample_rate=1e6)
    sa = sp.init(cfg_ave, jnp.float64)
    so = sp.init(cfg_one, jnp.float64)
    for _ in range(32):
        x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)) * 1000
        sa, _ = sp.accumulate(cfg_ave, sa, jnp.asarray(x))
        so, _ = sp.accumulate(cfg_one, so, jnp.asarray(x))
    da = np.asarray(sp.db_spectrum(cfg_ave, sa))
    do = np.asarray(sp.db_spectrum(cfg_one, so))
    assert np.std(da) < 0.5 * np.std(do)


def test_screen_map_maxhold_and_interp():
    cfg = sp.SpectrumConfig(fft_size=2048, sample_rate=1e6)
    state, _ = _feed_tone(cfg, power_db=-10.0, freq=100_000.0)
    db = sp.db_spectrum(cfg, state)
    # more bins than pixels: the tone must survive max-hold
    y = np.asarray(sp.screen_map(cfg, db, max_height=200, max_width=300,
                                 max_db=0.0, min_db=-120.0,
                                 start_freq=-500_000.0, stop_freq=500_000.0))
    assert y.shape[0] >= 300
    x_tone = int((100_000.0 + 500_000.0) / 1e6 * 300)
    assert y[max(0, x_tone - 2):x_tone + 3].min() < 40   # near top of screen
    assert np.median(y) >= 195                           # floor near bottom
    # more pixels than bins (zoomed span)
    y2 = np.asarray(sp.screen_map(cfg, db, max_height=200, max_width=400,
                                  max_db=0.0, min_db=-120.0,
                                  start_freq=99_000.0, stop_freq=101_000.0))
    assert y2.shape[0] == 400
    assert y2.min() < 40
