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
