"""Settings persistence, checkpoint/resume, and CLI smoke tests."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutesdr_tpu import settings
from cutesdr_tpu.pipeline.receiver import Receiver, ReceiverConfig
from cutesdr_tpu.testbench.generators import tone

C64 = jnp.complex64


def test_settings_roundtrip(tmp_path):
    s = settings.SessionSettings()
    s.volume = 42
    s.radio.center_frequency = 7_100_000
    s.demod["usb"].hi_cut = 3100
    path = tmp_path / "settings.json"
    s.save(path)
    s2 = settings.SessionSettings.load(path)
    assert s2.volume == 42
    assert s2.radio.center_frequency == 7_100_000
    assert s2.demod["usb"].hi_cut == 3100
    assert "cwl" in s2.demod       # defaults filled in


def test_settings_load_missing_gives_defaults(tmp_path):
    s = settings.SessionSettings.load(tmp_path / "nope.json")
    assert s.demod_mode == "usb"


def test_checkpoint_resume_deterministic(tmp_path):
    """Save mid-stream, resume, and verify identical continuation output."""
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         tune_freq=20_000.0, audio_rate=None)
    x = tone(cfg.block_size * 4, 21_000.0, cfg.input_rate, -20.0)
    blocks = np.split(x, 4)

    rx = Receiver(cfg)
    for b in blocks[:2]:
        rx.process(jnp.asarray(b, C64))
    ckpt = tmp_path / "state.npz"
    settings.save_state(ckpt, rx.state, stream_offset=2 * cfg.block_size)

    cont_a = [np.asarray(rx.process(jnp.asarray(b, C64)).audio)
              for b in blocks[2:]]

    rx2 = Receiver(cfg)
    rx2.state, off = settings.load_state(ckpt, rx2.state)
    assert off == 2 * cfg.block_size
    cont_b = [np.asarray(rx2.process(jnp.asarray(b, C64)).audio)
              for b in blocks[2:]]
    np.testing.assert_array_equal(np.concatenate(cont_a),
                                  np.concatenate(cont_b))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    cfg1 = ReceiverConfig(input_rate=500_000.0, mode="usb", audio_rate=None)
    cfg2 = ReceiverConfig(input_rate=2_000_000.0, mode="usb", audio_rate=None)
    rx1, rx2 = Receiver(cfg1), Receiver(cfg2)
    p = tmp_path / "s.npz"
    settings.save_state(p, rx1.state)
    with pytest.raises(ValueError, match="config mismatch"):
        settings.load_state(p, rx2.state)


@pytest.mark.slow
def test_cli_run_tone_to_wav(tmp_path):
    out = tmp_path / "a.wav"
    r = subprocess.run(
        [sys.executable, "-m", "cutesdr_tpu.cli", "run",
         "--source", "tone:101500", "--fs", "500000", "--mode", "usb",
         "--freq", "100000", "--seconds", "0.2", "--out", str(out)],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ,
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": "."})
    assert r.returncode == 0, r.stderr[-2000:]
    import wave
    with wave.open(str(out)) as w:
        assert w.getnframes() > 1000


@pytest.mark.slow
def test_cli_spectrum_finds_tone(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "cutesdr_tpu.cli", "spectrum",
         "--source", "tone:50000", "--fs", "500000",
         "--fft-size", "1024", "--frames", "4"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ,
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": "."})
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert abs(res["peak_freq_hz"] - 50000) < 1000
    assert res["peak_db"] > res["noise_floor_db"] + 30


def test_receiver_config_from_settings():
    s = settings.SessionSettings()
    s.demod_mode = "am"
    s.demod["am"].agc_decay = 500.0
    s.radio.center_frequency = 10_000_000
    s.radio.demod_frequency = 10_100_000
    cfg = settings.receiver_config_from_settings(s, input_rate=2e6)
    assert cfg.mode == "am"
    assert cfg.agc_decay_ms == 500.0
    assert cfg.tune_freq == 100_000.0
    # config is usable end-to-end
    rx = Receiver(cfg)
    rx.process(jnp.zeros(cfg.block_size, C64))
