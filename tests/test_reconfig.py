"""Glitch-free live reconfiguration: mode / rate changes against a running
stream must not drop samples, must keep the oscillator phase and level
trackers, and must settle within a bounded transient — the reference's
mutex-guarded live SetDemod (dsp/demodulator.cpp:107-157) re-expressed as
program switching + carry migration (pipeline.receiver.migrate_state)."""

import jax
import jax.numpy as jnp
import numpy as np

from cutesdr_tpu.pipeline.receiver import (Receiver, ReceiverConfig, init,
                                           migrate_state)
from cutesdr_tpu.session import ReceiverSession
from cutesdr_tpu.testbench.generators import tone
from cutesdr_tpu.types import K_2PI


def _cont_tone(n, freq_hz, fs, power_db, start_n):
    """Phase-continuous tone segments: segment k resumes where k-1 ended."""
    return tone(n, freq_hz, fs, power_db,
                phase0=K_2PI * freq_hz / fs * start_n)


def test_migrate_state_same_config_is_identity():
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         tune_freq=10_000.0, audio_rate=48000.0)
    _, s0 = init(cfg)
    rx = Receiver(cfg)
    rx.process(jnp.asarray(tone(cfg.block_size, 11_000.0, cfg.input_rate,
                                -20.0), jnp.complex64))
    migrated = migrate_state(cfg, rx.state, cfg, s0)
    got = jax.tree_util.tree_leaves(migrated)
    want = jax.tree_util.tree_leaves(rx.state)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_receiver_reconfigure_filter_size_continuous():
    """Shrinking the channel filter mid-stream (same mode, same rates):
    the decimator history carries over exactly, so post-switch audio holds
    the pre-switch amplitude after at most one overlap-save fill-in."""
    base = ReceiverConfig(input_rate=500_000.0, mode="usb",
                          tune_freq=10_000.0, audio_rate=None, agc_on=False)
    small = ReceiverConfig(input_rate=500_000.0, mode="usb",
                           tune_freq=10_000.0, audio_rate=None, agc_on=False,
                           fastfir_nfft=512, fastfir_ntaps=257)
    n = base.block_size * 4
    x = tone(n, 11_500.0, base.input_rate, -20.0)

    rx = Receiver(base)
    out = []
    pos = 0
    for _ in range(2):
        out.append(np.asarray(rx.process(
            jnp.asarray(x[pos:pos + base.block_size], jnp.complex64)).audio))
        pos += base.block_size
    rx.reconfigure(small)
    while pos + small.block_size <= n:
        out.append(np.asarray(rx.process(
            jnp.asarray(x[pos:pos + small.block_size], jnp.complex64)).audio))
        pos += small.block_size
    audio = np.concatenate(out)
    assert pos == n                       # every input sample consumed
    # audio-domain positions: base blocks yield base.fastfir_valid each
    n_pre = 2 * base.fastfir_valid
    v = small.fastfir_valid
    pre = audio[base.fastfir_valid:n_pre]
    post = audio[n_pre + v:]
    assert len(post) > 0
    amp_pre = np.sqrt(np.mean(pre ** 2))
    amp_post = np.sqrt(np.mean(post ** 2))
    assert abs(amp_post - amp_pre) / amp_pre < 0.05, (amp_pre, amp_post)


def test_session_mode_walk_no_dropped_samples():
    """USB → AM → FM → USB against a continuous tone: every full block of
    input is consumed across the walk, and the return to USB lands on the
    cached program with the tone at the original audio frequency (stream
    position, tune, and NCO phase preserved)."""
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         low_cut=100.0, hi_cut=2800.0,
                         tune_freq=50_000.0, audio_rate=48000.0)
    sess = ReceiverSession(cfg)
    sess.start()
    sess.precompile(["am", "fm"])
    assert len(sess._receivers) == 3

    f_audio = 1500.0
    n_per_segment = 6 * cfg.block_size
    pos = {"n": 0}

    def feed(n):
        x = _cont_tone(n, 50_000.0 + f_audio, cfg.input_rate, -20.0,
                       pos["n"])
        pos["n"] += n
        return sess.pump(x)

    feed(n_per_segment)                   # usb
    usb_rx = sess.receiver
    sess.set_mode("am")
    assert sess.cfg.mode == "am"
    feed(n_per_segment)                   # am
    sess.set_mode("fm")
    feed(n_per_segment)                   # fm
    sess.set_mode("usb")
    assert sess.receiver is usb_rx        # cached program reused
    blocks_back = feed(n_per_segment)     # usb again
    assert blocks_back >= 1

    # no dropped samples: consumed + pending == fed
    sess.flush()
    assert sess.metrics.samples_in + len(sess._pending) == pos["n"]
    assert len(sess._pending) < sess.cfg.block_size

    # back on usb: the tone demodulates at 1.5 kHz again
    out = sess.receiver.process(jnp.asarray(
        _cont_tone(sess.cfg.block_size, 50_000.0 + f_audio, cfg.input_rate,
                   -20.0, pos["n"]), jnp.complex64))
    audio = np.asarray(out.audio)[:int(out.n_audio)]
    t = np.arange(len(audio)) / 48000.0
    a = abs(audio.astype(np.complex128)
            @ np.exp(-2j * np.pi * f_audio * t)) / len(audio) * 2
    p_tone = 20 * np.log10(a + 1e-30)
    p_tot = 10 * np.log10(np.mean(audio ** 2) + 1e-30)
    assert p_tone - 3.01 > p_tot - 1.0


def test_session_mode_walk_bounded_transient():
    """The first audio block after a USB→AM switch is already at a sane
    level: the AGC trackers and input-rate histories carried over, so the
    switch transient is bounded (no slam to zero / no blow-up)."""
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         low_cut=100.0, hi_cut=2800.0,
                         tune_freq=50_000.0, audio_rate=None)
    sess = ReceiverSession(cfg)
    sess.start()
    sess.precompile(["am"])
    n = {"n": 0}

    def feed(k):
        x = _cont_tone(k, 51_500.0, cfg.input_rate, -20.0, n["n"])
        n["n"] += k
        return sess.pump(x)

    feed(6 * cfg.block_size)
    sm_usb = sess.metrics.smeter_ave_db
    sess.set_mode("am")
    feed(2 * sess.cfg.block_size)
    # S-meter continuous through the switch (level trackers migrated);
    # the channel filter width changed, so allow a few dB
    assert abs(sess.metrics.smeter_ave_db - sm_usb) < 6.0


def test_session_rate_change_migrates():
    """Input-rate change (the radio's bandwidth-index switch): new
    decimation plan, stream continues, meters carry."""
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         tune_freq=20_000.0, audio_rate=48000.0)
    sess = ReceiverSession(cfg)
    sess.start()
    sess.pump(tone(6 * cfg.block_size, 21_500.0, cfg.input_rate, -20.0))
    sess.flush()
    sm_before = sess.metrics.smeter_ave_db   # settled (attack ~10 ms)
    sess.set_input_rate(2_000_000.0)
    assert sess.cfg.input_rate == 2_000_000.0
    blocks = sess.pump(tone(2 * sess.cfg.block_size, 21_500.0, 2_000_000.0,
                            -20.0))
    assert blocks >= 1
    sess.flush()
    assert abs(sess.metrics.smeter_ave_db - sm_before) < 12.0
