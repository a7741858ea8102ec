"""Golden probe-tap tests: the receiver's named intermediate outputs
(PROFILE_1..3 equivalents) must match the float64 oracle chain stage by
stage — the automated version of the reference's probe-scope verification
methodology (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np

import oracles
from cutesdr_tpu.design.fastfir_design import design_fastfir
from cutesdr_tpu.ops import agc as agc_mod
from cutesdr_tpu.pipeline.receiver import Receiver, ReceiverConfig
from cutesdr_tpu.testbench.generators import GenConfig, SignalGenerator


def test_probe_taps_match_oracle_stages():
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         tune_freq=100_000.0, audio_rate=None,
                         probes=True, agc_thresh_db=-90.0)
    gen = SignalGenerator(GenConfig(
        sample_rate=cfg.input_rate, sweep_start_hz=100_800.0,
        sweep_stop_hz=100_800.0, signal_power_db=-25.0,
        noise_power_db=-65.0))
    n_blocks = 4
    x = gen.next_block(cfg.block_size * n_blocks)

    # oracle chain, collecting each stage
    n = np.arange(len(x))
    inc = np.round(-(cfg.tune_freq) / cfg.input_rate * 2.0 ** 32) / 2.0 ** 32
    mixed = x * np.exp(1j * 2 * np.pi * inc * n)
    o_p1 = oracles.CascadeOracle(cfg.plan)(mixed)
    h = design_fastfir(cfg.low_cut, cfg.hi_cut, 0.0, cfg.output_rate)
    o_p2 = oracles.FastFirOracle(h)(o_p1)
    acfg = agc_mod.AgcConfig(True, False, cfg.output_rate)
    o_p3 = oracles.AgcOracle(acfg, cfg.agc_thresh_db, cfg.agc_manual_gain_db,
                             cfg.agc_slope, cfg.agc_decay_ms)(o_p2)

    rx = Receiver(cfg)
    p1, p2, p3 = [], [], []
    for b in np.split(x, n_blocks):
        out = rx.process(jnp.asarray(b, jnp.complex64))
        p1.append(np.asarray(out.probes["p1_downconvert"]))
        p2.append(np.asarray(out.probes["p2_fastfir"]))
        p3.append(np.asarray(out.probes["p3_agc"]))
    p1, p2, p3 = map(np.concatenate, (p1, p2, p3))

    for got, want, name, tol in ((p1, o_p1, "p1_downconvert", 2e-5),
                                 (p2, o_p2, "p2_fastfir", 5e-5),
                                 (p3, o_p3, "p3_agc", 2e-3)):
        assert got.shape == want.shape, name
        scale = max(np.abs(want).max(), 1e-9)
        err = np.abs(got - want).max() / scale
        assert err < tol, (name, err)


def test_p6_pll_internal_probe():
    """P6 — the reference's ad-hoc PLL-internals tap (dsp/samdemod.cpp:92
    `phzerror*100.0`, dsp/fmdemod.cpp:120): with probes on and a PLL mode,
    the receiver emits the per-sample phase error x100.  A locked PLL on a
    clean carrier drives it toward zero; the session exposes it as tap
    'p6_pll' (rejecting it for non-PLL modes)."""
    import pytest

    from cutesdr_tpu.session import ReceiverSession
    from cutesdr_tpu.testbench.generators import tone

    cfg = ReceiverConfig(input_rate=250_000.0, mode="sam",
                         tune_freq=60_000.0, audio_rate=None, probes=True)
    # AM carrier 100 Hz above the tune frequency: the SAM PLL must pull in
    fs = cfg.input_rate
    n = cfg.block_size * 6
    t = np.arange(n) / fs
    x = (2000.0 * (1.0 + 0.4 * np.cos(2 * np.pi * 400.0 * t))
         * np.exp(2j * np.pi * 60_100.0 * t)).astype(np.complex64)

    rx = Receiver(cfg)
    p6 = []
    for b in np.split(x, 6):
        out = rx.process(jnp.asarray(b))
        assert "p6_pll" in out.probes
        p6.append(np.asarray(out.probes["p6_pll"]))
    p6 = np.concatenate(p6)
    assert p6.shape == (n // cfg.plan.decimation,)
    # locked: phase error x100 settles well inside +-100*pi
    tail = p6[len(p6) // 2:]
    assert np.abs(tail).max() < 40.0, np.abs(tail).max()
    # and it is a real error signal: the acquisition transient at the
    # start of the record shows the loop actually pulling in
    assert np.abs(p6[:len(p6) // 2]).max() > 1.0

    # session surface: valid for sam/fm, rejected elsewhere
    sess = ReceiverSession(ReceiverConfig(input_rate=250_000.0, mode="sam",
                                          tune_freq=60_000.0,
                                          audio_rate=None))
    sess.start()
    assert sess.set_probe("p6") == "p6_pll"
    sess.pump(x[:cfg.block_size])
    sess.flush()
    frame = sess.probe_frame()
    assert frame["tap"] == "p6_pll"
    sess2 = ReceiverSession(ReceiverConfig(input_rate=250_000.0, mode="usb"))
    sess2.start()
    with pytest.raises(ValueError, match="PLL mode"):
        sess2.set_probe("p6")


def test_spectrum_max_size():
    """65536-pt display FFT (the reference's maximum) works end to end."""
    import jax.numpy as jnp
    from cutesdr_tpu.pipeline import spectrum as sp
    from cutesdr_tpu.testbench.generators import tone

    cfg = sp.SpectrumConfig(fft_size=65536, sample_rate=2e6)
    state = sp.init(cfg)
    x = tone(65536, 250_000.0, 2e6, power_db=-10.0)
    state, _ = sp.accumulate(cfg, state, jnp.asarray(x, jnp.complex64))
    db = np.asarray(sp.db_spectrum(cfg, state)) * 10.0
    pk = int(np.argmax(db))
    f_pk = (pk - 32768) * 2e6 / 65536
    assert abs(f_pk - 250_000.0) < 100.0
    assert abs(db[pk] + 10.0) < 1.0
