"""Tests for the probe instruments, spectrum server, and metrics."""

import json
import urllib.request

import numpy as np
import pytest

from cutesdr_tpu.metrics import StreamMetrics
from cutesdr_tpu.serve import SpectrumServer
from cutesdr_tpu.testbench.probes import (ProbeSpectrum, TriggeredCapture,
                                          TriggerMode)


def test_triggered_capture_pos_edge():
    cap = TriggeredCapture(length=256, pre_samples=64, level=0.5,
                           hysteresis=0.1, mode=TriggerMode.NORM_POS)
    t = np.arange(2000)
    x = np.where((t > 900) & (t < 1100), 1.0, 0.0)   # one pulse
    done = False
    for blk in np.split(x, 10):
        if cap.feed(blk):
            done = True
            break
    assert done
    # trigger lands at pre_samples; pulse edge at the trigger point
    assert cap.record[63] < 0.5 <= cap.record[64]


def test_triggered_capture_single_mode_stops():
    cap = TriggeredCapture(length=128, pre_samples=16, level=0.5,
                           mode=TriggerMode.SINGLE_POS)
    x = np.concatenate([np.zeros(100), np.ones(200), np.zeros(100),
                        np.ones(200)])
    events = sum(cap.feed(b) for b in np.split(x, 6))
    assert events == 1          # single-shot: second pulse ignored


def test_triggered_capture_free_run():
    cap = TriggeredCapture(length=100, mode=TriggerMode.FREE_RUN)
    assert not cap.feed(np.arange(60))
    assert cap.feed(np.arange(60))
    assert len(cap.record) == 100


def test_probe_spectrum_finds_tone():
    fs = 48000.0
    t = np.arange(8192) / fs
    x = np.exp(2j * np.pi * 6000.0 * t) * 10000.0
    ps = ProbeSpectrum(sample_rate=fs)
    ps.feed(x.astype(np.complex64))
    db = ps.spectrum_db()
    peak = np.argmax(db)
    f_peak = (peak - len(db) // 2) * fs / len(db)
    assert abs(f_peak - 6000.0) < 50.0


def test_spectrum_server_roundtrip():
    tunes = []
    srv = SpectrumServer(port=0, sample_rate=1e6,
                         on_tune=lambda f: tunes.append(f)).start()
    try:
        srv.update(np.linspace(-120, -20, 1024), smeter_db=-42.0)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/spectrum.json") as r:
            d = json.loads(r.read())
        assert len(d["db"]) == 1024
        assert d["smeter_db"] == -42.0
        # page served
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/") as r:
            assert b"canvas" in r.read()
        # tune POST
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/tune",
            data=json.dumps({"fraction": 0.75}).encode(), method="POST")
        urllib.request.urlopen(req)
        assert tunes and abs(tunes[0] - 0.25 * 1e6) < 1.0
    finally:
        srv.stop()


def test_spectrum_server_sse_push_and_filter_drag():
    """Frames arrive over /events without polling; /filter round-trips the
    session's clamped edges; /tune returns the applied (rounded) value."""
    import http.client

    srv = SpectrumServer(port=0, sample_rate=1e6,
                         on_tune=lambda f: round(f / 100) * 100,
                         on_filter=lambda lo, hi: (max(lo, -8000.0),
                                                   min(hi, 8000.0))).start()
    try:
        srv.set_view(tune_hz=0.0, low_hz=-5000.0, hi_hz=5000.0)
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=5)
        conn.request("GET", "/events")
        resp = conn.getresponse()
        assert resp.getheader("Content-Type") == "text/event-stream"

        def read_event():
            buf = b""
            while not buf.endswith(b"\n\n"):
                c = resp.read(1)
                if not c:
                    raise AssertionError("stream closed")
                buf += c
            return buf

        # initial frame is pushed immediately on connect
        first = read_event()
        assert first.startswith(b"data: ")
        d = json.loads(first[6:])
        assert d["tune_hz"] == 0.0 and len(d["db"]) == 1024

        # a publish triggers a push (no client request in between)
        srv.update(np.full(512, -30.0), smeter_db=-21.0)
        ev = read_event()
        while not ev.startswith(b"data: "):     # skip keepalive comments
            ev = read_event()
        d = json.loads(ev[6:])
        assert d["smeter_db"] == -21.0 and len(d["db"]) == 512

        # filter drag POST: server reports the clamped edges back
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/filter",
            data=json.dumps({"low_hz": -20000.0, "hi_hz": 3000.0}).encode(),
            method="POST")
        with urllib.request.urlopen(req) as r:
            d = json.loads(r.read())
        assert d == {"low_hz": -8000.0, "hi_hz": 3000.0}
        assert srv.view["low_hz"] == -8000.0

        # tune POST with absolute freq: rounded value comes back
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/tune",
            data=json.dumps({"freq_hz": 12349.0}).encode(), method="POST")
        with urllib.request.urlopen(req) as r:
            d = json.loads(r.read())
        assert d == {"tune_hz": 12300.0}
        assert srv.view["tune_hz"] == 12300.0
        conn.close()
    finally:
        srv.stop()


def test_session_set_filter_clamps_and_mirrors():
    """Session-side edge enforcement: per-mode limits + symmetric mirror
    (AM/FM are symmetric in the reference's table)."""
    from cutesdr_tpu.pipeline.receiver import ReceiverConfig
    from cutesdr_tpu.session import ReceiverSession

    sess = ReceiverSession(ReceiverConfig(input_rate=500_000.0, mode="am"))
    lo, hi = sess.set_filter(-3000.0, 7000.0)
    assert (lo, hi) == (-7000.0, 7000.0)        # mirrored to the wider edge
    lo, hi = sess.set_filter(-99000.0, 99000.0)
    assert (lo, hi) == (-10000.0, 10000.0)      # clamped to the AM limits

    sess2 = ReceiverSession(ReceiverConfig(input_rate=500_000.0, mode="usb"))
    lo, hi = sess2.set_filter(-50.0, 30000.0)
    assert (lo, hi) == (0.0, 20000.0)           # USB low in [0,200]
    assert (sess2.current_low, sess2.current_hi) == (lo, hi)


def test_stream_metrics():
    m = StreamMetrics()
    m.update_block(131072, 787, -42.0, -40.0)
    m.missed_packets = 3
    d = m.as_dict()
    assert d["samples_in"] == 131072
    assert d["missed_packets"] == 3
    assert "Msps" in m.status_line()
    json.loads(m.json_line())


def test_stage_timer():
    import jax.numpy as jnp
    from cutesdr_tpu.profiling import StageTimer

    t = StageTimer()
    for _ in range(3):
        t.timed("square", lambda v: v * v, jnp.arange(8.0))
        t.lap("interval")
    rep = t.report(samples_per_call={"square": 8})
    assert "square" in rep and "ns/samp" in rep
    assert len(t.stats["square"]) == 3
    assert len(t.stats["interval"]) == 2


def test_mode_switch_endpoint():
    """POST /mode drives session.set_mode (glitch-free program switch) and
    the frame reflects the new mode + filter edges."""
    import json
    import urllib.request

    from cutesdr_tpu.pipeline.receiver import MODE_LIMITS, ReceiverConfig
    from cutesdr_tpu.serve import SpectrumServer
    from cutesdr_tpu.session import ReceiverSession

    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         tune_freq=10_000.0, audio_rate=None)
    sess = ReceiverSession(cfg)
    sess.start()

    def on_mode(mode):
        sess.set_mode(mode)
        c = sess.cfg
        srv.set_view(low_hz=c.low_cut, hi_hz=c.hi_cut,
                     symmetric=MODE_LIMITS[mode][4])
        return mode

    srv = SpectrumServer(port=0, sample_rate=cfg.input_rate,
                         on_mode=on_mode).start()
    srv.set_view(mode=cfg.mode, tune_hz=cfg.tune_freq,
                 low_hz=cfg.low_cut, hi_hz=cfg.hi_cut)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/mode",
            data=json.dumps({"mode": "am"}).encode(),
            headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp["mode"] == "am"
        assert sess.cfg.mode == "am"
        frame = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/spectrum.json").read())
        assert frame["mode"] == "am"
        assert frame["symmetric"] is True          # AM is a symmetric mode
        # stream continues through the switched program
        import numpy as np
        n = sess.cfg.block_size
        sess.pump(np.zeros(2 * n, np.complex64))
        assert sess.metrics.blocks >= 1
    finally:
        sess.stop()
        srv.stop()


def test_probe_tap_scope_over_http():
    """The serving UI's probe-tap scope (VERDICT r2 item 8, the last
    reference debugging affordance, gui/testbench.cpp:583-898): POST
    /probe selects a live pipeline tap, frames then carry the tap's
    spectrum (or triggered time record); 'off' removes it."""
    from cutesdr_tpu.pipeline.receiver import ReceiverConfig
    from cutesdr_tpu.session import ReceiverSession
    from cutesdr_tpu.testbench.generators import tone

    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         tune_freq=60_000.0, audio_rate=48000.0)
    sess = ReceiverSession(cfg)
    sess.start()
    srv = SpectrumServer(port=0, sample_rate=cfg.input_rate,
                         on_tune=sess.tune_clicked,
                         on_probe=sess.set_probe).start()
    sess.on_spectrum = lambda db: srv.update(
        db, smeter_db=sess.metrics.smeter_ave_db, probe=sess.probe_frame())
    sess.analyzer.max_display_rate = 1e9
    sess.analyzer._skip = 1

    def post(path, body, expect=200):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{path}",
            data=json.dumps(body).encode(), method="POST")
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def frame():
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/spectrum.json") as r:
            return json.loads(r.read())

    try:
        x = tone(cfg.block_size * 6, 61_000.0, cfg.input_rate, -20.0)

        # select the channel-filter tap as a spectrum
        code, d = post("/probe", {"tap": "p2", "view": "spectrum"})
        assert code == 200 and d["tap"] == "p2_fastfir"
        for b in np.split(x, 6):
            sess.pump(b)
        sess.flush()
        d = frame()
        assert "probe" in d
        p = d["probe"]
        assert p["tap"] == "p2_fastfir" and p["view"] == "spectrum"
        db = np.asarray(p["db"])
        # the 1 kHz audio tone peaks near +1 kHz at the decimated rate
        pk = (np.argmax(db) - len(db) // 2) * p["sample_rate"] / len(db)
        assert abs(pk - 1000.0) < 100.0, pk

        # scope view on the demod tap: free-run record arrives
        code, d = post("/probe", {"tap": "p4", "view": "scope",
                                  "trigger_mode": "free"})
        assert code == 200 and d["tap"] == "p4_demod"
        for b in np.split(x, 6):
            sess.pump(b)
        sess.flush()
        p = frame()["probe"]
        assert p["view"] == "scope" and p["record"] is not None
        assert len(p["record"]) == 1024

        # invalid tap is a 400, state unchanged
        code, d = post("/probe", {"tap": "p9"})
        assert code == 400 and "error" in d

        # p7 without the blanker is a 400 (clear error, not a crash)
        code, d = post("/probe", {"tap": "p7"})
        assert code == 400

        # off removes the probe from frames
        code, d = post("/probe", {"tap": "off"})
        assert code == 200 and d["tap"] is None
        sess.pump(x[:cfg.block_size])
        sess.flush()
        assert "probe" not in frame()
        assert not sess.cfg.probes          # switched back, glitch-free
    finally:
        srv.stop()


def test_freqctrl_digit_editor_served():
    """The per-digit frequency control (gui/freqctrl.cpp's web equivalent):
    the page carries the editor + its digit logic, and frames carry the
    rf_center the editor needs to display absolute station frequency."""
    srv = SpectrumServer(port=0, sample_rate=1e6).start()
    try:
        srv.set_view(tune_hz=12_345.0, rf_center=7_000_000.0)
        srv.update(np.full(1024, -100.0))
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/") as r:
            page = r.read().decode()
        for needle in ("freqctrl", "fcRender", "lead-zero", "fcClamp"):
            assert needle in page, needle
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/spectrum.json") as r:
            d = json.loads(r.read())
        assert d["rf_center"] == 7_000_000.0
        assert d["tune_hz"] == 12_345.0
    finally:
        srv.stop()
