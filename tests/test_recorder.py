"""SigMF recording + pre-trigger ring recorder tests.

The reference has no recorder (only `#if 0` playback kludges,
interface/netiobase.cpp:536-625); these cover the new framework's capture
path end-to-end: write -> metadata -> playback equality, and the ring's
pre/post-trigger sample accounting.
"""

import json

import numpy as np
import pytest

from cutesdr_tpu.io.recorder import (RingRecorder, SigMFWriter, open_sigmf,
                                     sigmf_metadata)


def _tone(n, f=0.01, amp=10000.0, phase0=0.0):
    t = np.arange(n)
    return (amp * np.exp(2j * np.pi * f * t + 1j * phase0)).astype(np.complex64)


def test_sigmf_roundtrip_int16(tmp_path):
    base = str(tmp_path / "cap")
    iq = _tone(5000)
    with SigMFWriter(base, "int16", sample_rate=2e6, center_freq=10e6,
                     description="test") as w:
        w.write(iq[:3000])
        w.write(iq[3000:])
        w.annotate(100, 50, label="burst")
    meta = json.loads((tmp_path / "cap.sigmf-meta").read_text())
    assert meta["global"]["core:datatype"] == "ci16_le"
    assert meta["global"]["core:sample_rate"] == 2e6
    assert meta["captures"][0]["core:frequency"] == 10e6
    assert meta["annotations"][0]["core:label"] == "burst"

    src, meta2 = open_sigmf(base + ".sigmf-meta")
    back = src.next_block(5000)
    # int16 quantization: within 1 LSB of the rounded original
    assert np.max(np.abs(back.real - np.round(iq.real))) <= 1.0
    assert np.max(np.abs(back.imag - np.round(iq.imag))) <= 1.0
    assert meta2["global"]["core:sample_rate"] == 2e6


def test_sigmf_roundtrip_cf32(tmp_path):
    base = str(tmp_path / "cap32")
    iq = (_tone(1000) / 3.0).astype(np.complex64)
    with SigMFWriter(base, "cf32", sample_rate=48e3) as w:
        w.write(iq)
    src, _ = open_sigmf(base)
    back = src.next_block(1000)
    np.testing.assert_allclose(back, iq, rtol=0, atol=0)


def test_sigmf_rejects_unknown_format(tmp_path):
    with pytest.raises(ValueError):
        SigMFWriter(str(tmp_path / "x"), "int24")


def test_sigmf_metadata_fields():
    m = sigmf_metadata("cf32", 1e6, 7.1e6, extra_global={"core:author": "x"})
    assert m["global"]["core:version"] == "1.0.0"
    assert m["global"]["core:author"] == "x"
    assert m["captures"][0]["core:sample_start"] == 0


class _ListWriter:
    def __init__(self):
        self.chunks = []
        self.closed = False

    def write(self, iq):
        self.chunks.append(np.asarray(iq).copy())

    def close(self):
        self.closed = True

    @property
    def data(self):
        return (np.concatenate(self.chunks) if self.chunks
                else np.zeros(0, np.complex64))


def test_ring_pre_trigger_exact_history():
    ring = RingRecorder(capacity=1000)
    stream = np.arange(5000).astype(np.complex64)
    for i in range(0, 5000, 256):
        ring.push(stream[i:i + 256])
    w = _ListWriter()
    pre = ring.trigger(w, post=0)
    assert pre <= 1000
    # the flushed history is exactly the last `pre` samples pushed
    np.testing.assert_array_equal(w.data, stream[5000 - pre:])
    assert w.closed


def test_ring_post_trigger_streams_then_closes():
    ring = RingRecorder(capacity=100)
    ring.push(np.zeros(300, np.complex64))
    w = _ListWriter()
    pre = ring.trigger(w, post=500)
    assert ring.recording
    total_post = 0
    x = np.ones(256, np.complex64)
    while ring.recording:
        ring.push(x)
        total_post += 256
    assert w.closed
    assert len(w.data) == pre + 500
    assert ring.trigger_index == 300


def test_ring_double_trigger_raises():
    ring = RingRecorder(capacity=10)
    ring.push(np.zeros(5, np.complex64))
    w = _ListWriter()
    ring.trigger(w, post=100)
    with pytest.raises(RuntimeError):
        ring.trigger(_ListWriter(), post=1)


def test_cli_record_sigmf(tmp_path):
    from cutesdr_tpu.cli import main

    out = str(tmp_path / "clicap")
    rc = main(["record", "--source", "tone:5000", "--fs", "48000",
               "--seconds", "0.1", "--out", out, "--fmt", "int16"])
    assert rc == 0
    meta = json.loads((tmp_path / "clicap.sigmf-meta").read_text())
    assert meta["global"]["core:sample_rate"] == 48000
    src, _ = open_sigmf(out)
    blk = src.next_block(1024)
    assert np.max(np.abs(blk)) > 1000  # the tone is there


def test_cli_record_scheduled_start(tmp_path):
    import time

    from cutesdr_tpu.cli import main

    out = str(tmp_path / "sched")
    t0 = time.time()
    rc = main(["record", "--source", "tone:1000", "--fs", "48000",
               "--seconds", "0.05", "--out", out, "--start-at", "+0.3"])
    assert rc == 0
    assert time.time() - t0 >= 0.3
    assert (tmp_path / "sched.sigmf-data").exists()


def test_cli_record_pre_trigger(tmp_path):
    """Silence then a burst: the capture must include pre-trigger history."""
    import cutesdr_tpu.cli as cli

    n_silent, n_loud = 200_000, 200_000
    stream = np.concatenate([np.zeros(n_silent, np.complex64),
                             _tone(n_loud, amp=20000.0)])
    pos = [0]

    def fake_source(args, block):
        def nxt():
            if pos[0] >= len(stream):
                return None
            b = stream[pos[0]:pos[0] + block]
            pos[0] += block
            return b
        return nxt

    out = str(tmp_path / "trig")
    orig = cli._make_source
    cli._make_source = fake_source
    try:
        rc = cli.main(["record", "--source", "sweep", "--fs", "1000000",
                       "--seconds", "0.05", "--out", out,
                       "--pre-trigger-ms", "80", "--trigger-level", "5000"])
    finally:
        cli._make_source = orig
    assert rc == 0
    src, meta = open_sigmf(out)
    data = src.next_block(200_000)
    # some zero history before the burst, then the tone
    first_loud = int(np.argmax(np.abs(data) > 5000))
    assert 0 < first_loud <= 80_000  # inside the pre-trigger window
    assert np.max(np.abs(data[first_loud:first_loud + 1000])) > 15000


def test_dual_channel_sigmf_record_playback_roundtrip(tmp_path):
    """`record --dual` writes a channel-interleaved 2-channel SigMF
    capture (core:num_channels=2); `run --dual --source file:...` replays
    it through the MRC diversity chain and recovers the tone — the
    offline half of the dual-RX story."""
    import json as _json
    import wave

    import numpy as np

    from cutesdr_tpu import cli

    base = str(tmp_path / "dualcap")
    rc = cli.main(["record", "--dual",
                   "--source", "dualtone:101000:40:0.8",
                   "--fs", "500000", "--freq", "100000",
                   "--seconds", "0.4", "--out", base])
    assert rc == 0
    meta = _json.load(open(base + ".sigmf-meta"))
    assert meta["global"]["core:num_channels"] == 2
    n_frames = meta and (len(open(base + ".sigmf-data", "rb").read())
                         // (2 * 2 * 2))   # int16 I/Q x 2 channels
    assert n_frames >= 0.4 * 500_000

    out = str(tmp_path / "dual_playback.wav")
    rc = cli.main(["run", "--dual", "--source", f"file:{base}.sigmf-data",
                   "--fs", "500000", "--mode", "usb", "--freq", "100000",
                   "--seconds", "0.35", "--out", out])
    assert rc == 0
    with wave.open(out) as w:
        audio = np.frombuffer(w.readframes(w.getnframes()),
                              np.int16).astype(np.float64)
    a = audio[len(audio) // 2:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = np.fft.rfftfreq(len(a), 1 / 48000.0)[int(np.argmax(spec))]
    assert abs(f_pk - 1000.0) < 50.0, f_pk
