"""ReceiverSession integration test: generator -> session -> audio queue +
spectrum + metrics, with the rate-lock loop closed."""

import numpy as np

from cutesdr_tpu.pipeline.receiver import ReceiverConfig
from cutesdr_tpu.session import ReceiverSession
from cutesdr_tpu.testbench.generators import tone


def test_session_end_to_end():
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         tune_freq=100_000.0, audio_rate=48000.0)
    frames = []
    sess = ReceiverSession(cfg, on_spectrum=lambda db: frames.append(db))
    sess.analyzer.max_display_rate = 1000.0
    sess.analyzer._skip = 1
    sess.start()

    x = tone(cfg.block_size * 4, 101_500.0, cfg.input_rate, -20.0)
    # pump in odd-sized chunks to exercise re-blocking
    for chunk in np.array_split(x, 7):
        sess.pump(chunk)
    sess.flush()      # deliver in-flight pipelined steps (pipeline_depth=2)

    assert sess.metrics.blocks == 4
    assert sess.metrics.samples_in == cfg.block_size * 4
    assert sess.metrics.audio_samples_out > 0
    assert -30.0 < sess.metrics.smeter_ave_db < 0.0
    assert frames, "spectrum frames should have been produced"
    # the raw-stream spectrum should peak near +101.5 kHz
    db = frames[-1]
    peak_bin = int(np.argmax(db))
    f_peak = (peak_bin - len(db) // 2) * cfg.input_rate / len(db)
    assert abs(f_peak - 101_500.0) < 2_000.0

    # audio queue should have samples; drain them
    got = sess.audio_queue.get(256)
    assert got.shape == (256,)
    assert "Msps" in sess.status_line()


def test_session_tune_and_volume():
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         tune_freq=50_000.0, audio_rate=None, agc_on=False)
    sess = ReceiverSession(cfg)
    sess.start()
    sess.tune(120_000.0)
    sess.set_volume(0)
    x = tone(cfg.block_size, 121_000.0, cfg.input_rate, -20.0)
    sess.pump(x)
    sess.flush()
    # muted: queue only zeros
    level = sess.audio_queue.level
    assert level > 0


def test_tune_clicked_rounds_to_resolution():
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb", audio_rate=None)
    sess = ReceiverSession(cfg)
    sess.settings.demod["usb"].filter_click_resolution = 100
    assert sess.tune_clicked(123_456.7) == 123_500.0
    sess.settings.demod["usb"].filter_click_resolution = 1000
    assert sess.tune_clicked(123_456.7) == 123_000.0


def test_serve_settings_roundtrip(tmp_path):
    """`serve --settings PATH` loads at start and persists last-used state
    at exit (the MainWindow QSettings workflow)."""
    import json

    from cutesdr_tpu import cli
    from cutesdr_tpu.settings import SessionSettings

    path = tmp_path / "settings.json"
    st = SessionSettings()
    st.volume = 42
    st.radio.spur_offset_i = 0.125
    st.demod["usb"].hi_cut = 2500.0
    st.save(path)

    rc = cli.main(["serve", "--no-precompile", "--source", "tone:100000", "--fs", "2000000",
                   "--mode", "usb", "--freq", "100000",
                   "--seconds", "0.2", "--port", "0",
                   "--settings", str(path)])
    assert rc == 0
    doc = json.loads(path.read_text())
    assert doc["volume"] == 42                        # loaded + preserved
    assert doc["demod_mode"] == "usb"                 # last-used mode saved
    assert doc["radio"]["demod_frequency"] == 100000  # last tune saved
    assert doc["radio"]["center_frequency"] == 0      # schema: tune=demod-center
    assert doc["demod"]["usb"]["hi_cut"] == 2500.0    # table roundtrips


def test_program_cache_lru_eviction():
    """Walking more configs than max_cached_programs evicts the oldest
    programs, keeps the active one, and stream processing stays correct
    (VERDICT r2 item 9: a long-running serve must not accumulate compiled
    programs without bound)."""
    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb", audio_rate=None,
                         agc_on=False)
    sess = ReceiverSession(cfg, max_cached_programs=3)
    sess.start()
    x = tone(cfg.block_size, 21_000.0, cfg.input_rate, -20.0)
    sess.pump(x)

    # walk 6 distinct configs (different filter-size buckets via hi_cut is a
    # params change, so vary the static squelch_ui field instead)
    from dataclasses import replace
    for k in range(6):
        sess._switch_to(replace(sess.cfg, squelch_ui=k + 1))
        sess.pump(x)
    sess.flush()
    assert len(sess._receivers) <= 3
    assert sess._cfg_key(sess.cfg) in sess._receivers  # active survives

    # revisiting an evicted config recompiles and still processes correctly
    sess._switch_to(replace(sess.cfg, squelch_ui=1))
    blocks = sess.pump(x)
    sess.flush()
    assert blocks == 1
    assert sess.metrics.audio_samples_out > 0


def test_pump_planes_int16_matches_complex_pump():
    """The high-rate ingest path (int16 wire planes, threaded
    double-buffered H2D, device-side cast) must produce the same audio as
    the complex-input pump on the same samples (VERDICT r2 item 1)."""
    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         tune_freq=60_000.0, audio_rate=48000.0)
    x = tone(cfg.block_size * 3 + 1234, 61_000.0, cfg.input_rate, -20.0)
    re = np.real(x).astype(np.int16)
    im = np.imag(x).astype(np.int16)

    s1 = ReceiverSession(cfg)
    s1.start()
    # odd-sized chunks exercise plane re-blocking and the ingest worker
    for lo in range(0, len(re), 10_000):
        s1.pump_planes(re[lo:lo + 10_000], im[lo:lo + 10_000])
    s1.flush()

    s2 = ReceiverSession(cfg)
    s2.start()
    s2.pump((re.astype(np.float32) + 1j * im.astype(np.float32))
            .astype(np.complex64))
    s2.flush()

    assert s1.metrics.blocks == s2.metrics.blocks == 3
    a1 = s1.audio_queue.get(s1.audio_queue.level)
    a2 = s2.audio_queue.get(s2.audio_queue.level)
    np.testing.assert_array_equal(a1, a2)
    assert s1.metrics.samples_in == 3 * cfg.block_size


def test_pump_planes_dtype_change_promotes_pending():
    """A mid-stream wire-dtype change (f32 feed followed by int16) with a
    partial block pending must promote the pending f32 remainder, not cast
    it down to int16 (silent truncation/wraparound — ADVICE r3)."""
    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         tune_freq=60_000.0, audio_rate=48000.0)
    n = cfg.block_size + cfg.block_size // 2    # leaves a half-block pending
    x = tone(2 * cfg.block_size, 61_000.0, cfg.input_rate, -20.0)
    re32 = (np.real(x) * 1.25).astype(np.float32)   # out of int16 range
    im32 = (np.imag(x) * 1.25).astype(np.float32)
    re16 = np.real(x).astype(np.int16)
    im16 = np.imag(x).astype(np.int16)

    s1 = ReceiverSession(cfg)
    s1.start()
    s1.pump_planes(re32[:n], im32[:n])              # f32, half block pending
    s1.pump_planes(re16[:cfg.block_size], im16[:cfg.block_size])  # int16
    s1.flush()

    s2 = ReceiverSession(cfg)
    s2.start()                                      # same samples, all f32
    s2.pump_planes(np.concatenate([re32[:n], re16[:cfg.block_size]
                                   .astype(np.float32)]),
                   np.concatenate([im32[:n], im16[:cfg.block_size]
                                   .astype(np.float32)]))
    s2.flush()

    assert s1.metrics.blocks == s2.metrics.blocks == 2
    a1 = s1.audio_queue.get(s1.audio_queue.level)
    a2 = s2.audio_queue.get(s2.audio_queue.level)
    np.testing.assert_array_equal(a1, a2)


def test_serve_dual_toggle(capsys):
    """`serve --dual` runs the MRC diversity session against a coherent
    dual-channel source and reports the tracked rx2 gain in the status
    line (the dual-RX serve toggle, VERDICT r2 item 7)."""
    from cutesdr_tpu import cli

    rc = cli.main(["serve", "--dual", "--source", "dualtone:101000:40:0.8",
                   "--fs", "500000", "--mode", "usb", "--freq", "100000",
                   "--seconds", "0.3", "--port", "0"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "rx2 gain" in err


def test_session_concurrent_reconfig_stress():
    """The session lock must keep the pump loop consistent while another
    thread (serve's HTTP handlers) flips modes and probes mid-stream —
    the reference's reconfigure-vs-process mutexes
    (dsp/demodulator.cpp:109/166) exercised under real contention."""
    import threading

    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         tune_freq=60_000.0, audio_rate=48000.0)
    sess = ReceiverSession(cfg, max_cached_programs=4)
    sess.start()
    x = tone(cfg.block_size, 61_000.0, cfg.input_rate, -20.0)
    stop = threading.Event()
    errors = []

    def reconfigurer():
        import random
        rng = random.Random(7)
        try:
            while not stop.is_set():
                r = rng.random()
                if r < 0.35:
                    sess.set_mode(rng.choice(["am", "usb", "fm"]))
                elif r < 0.6:
                    sess.set_probe(rng.choice(["p2", "p4"]),
                                   view=rng.choice(["spectrum", "scope"]))
                    sess.probe_frame()
                elif r < 0.8:
                    sess.set_probe(None)
                else:
                    sess.tune(60_000.0 + rng.uniform(-5e3, 5e3))
        except Exception as e:           # pragma: no cover - failure path
            errors.append(e)

    t = threading.Thread(target=reconfigurer, daemon=True)
    t.start()
    try:
        total = 0
        for _ in range(60):
            total += sess.pump(x)
        sess.flush()
    finally:
        stop.set()
        t.join(timeout=10)
    assert not errors, errors
    # mode switches change the block size (am re-blocks at 8192), so the
    # block count varies — but dispatched == delivered and nothing crashed
    assert total > 0
    assert sess.metrics.blocks == total
    assert np.isfinite(sess.metrics.smeter_ave_db)
    # stream still alive and correct in whatever mode we ended in
    sess.set_mode("usb")
    sess.pump(x)
    sess.flush()
    assert sess.metrics.audio_samples_out > 0
