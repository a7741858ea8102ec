"""Channel-bank session + serve integration.

Two tones in one wideband stream, two channels tuned to them: each
channel's S-meter must see its own tone, the monitor channel's audio must
carry the right tone, and the web UI must round-trip channel selection.
"""

import json
import urllib.request

import numpy as np
import pytest

from cutesdr_tpu.bank import BankSession
from cutesdr_tpu.pipeline.receiver import ReceiverConfig


def _two_tone(fs, f1, f2, n, amp=8000.0):
    t = np.arange(n) / fs
    x = amp * (np.exp(2j * np.pi * f1 * t) + np.exp(2j * np.pi * f2 * t))
    return x.astype(np.complex64)


def _make_session(**kw):
    cfg = ReceiverConfig(input_rate=2e6, mode="usb", tune_freq=0.0)
    # channels 2 kHz below each carrier -> 2 kHz audio tone in USB
    return BankSession(cfg, [98_000.0, 398_000.0], **kw), cfg


def test_bank_session_per_channel_smeter_and_audio():
    sess, cfg = _make_session()
    sess.start()
    iq = _two_tone(2e6, 100_000.0, 400_000.0, cfg.block_size * 6)
    blocks = sess.pump(iq)
    assert blocks == 6
    # both channels see a strong carrier
    assert sess.smeter_db[0] > -40 and sess.smeter_db[1] > -40
    # monitor 0 audio = 2 kHz tone
    n = sess.audio_queue.level
    sess.audio_queue._startup = False
    a = sess.audio_queue.get(min(n, 4096)).astype(np.float64)
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f = np.fft.rfftfreq(len(a), 1 / 48000.0)
    pk = f[np.argmax(spec)]
    assert abs(pk - 2000.0) < 50, pk


def test_bank_channel_mini_spectra():
    """The per-channel mini-spectra must show each channel's own audio tone
    (2 kHz on ch0, whatever ch1's offset demodulates to) above its floor."""
    sess, cfg = _make_session()
    sess.start()
    iq = _two_tone(2e6, 100_000.0, 400_000.0, cfg.block_size * 6)
    sess.pump(iq)
    info = sess.channel_info()
    for ch in info:
        spec = np.array(ch["spec"])
        assert spec.shape == (48,)
        # a strong line well above the per-channel floor
        assert spec.max() - np.median(spec) > 20, ch["id"]


def test_bank_select_and_retune():
    sess, cfg = _make_session()
    sess.start()
    assert sess.select(1) == 1
    assert sess.monitor == 1
    sess.tune_channel(0, 150_000.0)
    assert sess.tune_freqs[0] == 150_000.0
    # click-to-tune applies to the monitor channel with mode rounding
    applied = sess.tune_clicked(398_123.4)
    assert sess.tune_freqs[1] == applied
    info = sess.channel_info()
    assert info[1]["monitor"] and not info[0]["monitor"]
    assert info[0]["tune_hz"] == 150_000.0


def test_bank_serve_roundtrip():
    from cutesdr_tpu.serve import SpectrumServer

    sess, cfg = _make_session()
    sess.start()

    def on_select(i):
        m = sess.select(i)
        srv.set_view(tune_hz=sess.tune_freqs[m])
        return m

    srv = SpectrumServer(port=0, sample_rate=2e6,
                         on_tune=sess.tune_clicked,
                         on_select=on_select).start()
    try:
        sess.on_spectrum = lambda db: srv.update(
            db, smeter_db=float(sess.smeter_db[sess.monitor]),
            channels=sess.channel_info())
        iq = _two_tone(2e6, 100_000.0, 400_000.0, cfg.block_size * 6)
        sess.pump(iq)

        base = f"http://127.0.0.1:{srv.port}"
        frame = json.loads(urllib.request.urlopen(
            base + "/spectrum.json", timeout=5).read())
        assert len(frame["channels"]) == 2
        assert frame["channels"][0]["monitor"]
        assert frame["channels"][1]["smeter_db"] > -40

        req = urllib.request.Request(
            base + "/select", data=json.dumps({"channel": 1}).encode(),
            method="POST")
        resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert resp["selected"] == 1
        assert sess.monitor == 1

        frame = json.loads(urllib.request.urlopen(
            base + "/spectrum.json", timeout=5).read())
        assert frame["tune_hz"] == sess.tune_freqs[1]
    finally:
        srv.stop()


def test_cli_serve_channels_smoke(tmp_path):
    from cutesdr_tpu.cli import main

    rc = main(["serve", "--no-precompile", "--source", "tone:100000", "--fs", "2000000",
               "--mode", "usb", "--channels", "98000,398000",
               "--seconds", "0.2", "--port", "0"])
    assert rc == 0


def test_bank_probe_scope_monitor_channel():
    """BankSession probe scope: the monitor channel's tap renders as a
    spectrum (tone channel shows its +1 kHz audio-passband peak; switching
    the monitor switches whose tap is captured)."""
    from cutesdr_tpu.pipeline.receiver import ReceiverConfig
    from cutesdr_tpu.bank import BankSession
    from cutesdr_tpu.testbench.generators import tone

    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         audio_rate=48000.0)
    sess = BankSession(cfg, [30_000.0, 61_000.0], monitor=1)
    sess.start()
    assert sess.set_probe("p2") == "p2_fastfir"
    x = tone(cfg.block_size * 4, 62_000.0, cfg.input_rate, -20.0)
    for b in np.split(x, 4):
        sess.pump(b)
    sess.flush()
    p = sess.probe_frame()
    assert p["channel"] == 1 and p["view"] == "spectrum"
    db = np.asarray(p["db"])
    pk = (np.argmax(db) - len(db) // 2) * p["sample_rate"] / len(db)
    assert abs(pk - 1000.0) < 100.0, pk

    # off rebuilds without probes
    assert sess.set_probe(None) is None
    assert not sess.cfg.probes
    sess.pump(x[:cfg.block_size])
    sess.flush()
    assert sess.probe_frame() is None

    # unknown trigger mode is a ValueError (serve maps it to HTTP 400),
    # never a KeyError escaping the handler thread (ADVICE r3)
    with pytest.raises(ValueError, match="trigger mode"):
        sess.set_probe("p2", view="scope", trigger_mode="bogus")
