"""Browser-audio endpoint: /audio.wav streams the rate-locked queue as a
chunked WAV a browser <audio> element can play — the reference always
plays demodulated audio through the soundcard (interface/soundout.cpp:
86-133); serve previously only rendered spectrum, leaving a remote user a
radio they could tune but not hear (VERDICT r3 'missing' item 2)."""

import json
import socket
import struct
import threading
import time
import urllib.request

import numpy as np

from cutesdr_tpu.io.audio_sink import RateLockedQueue
from cutesdr_tpu.serve import SpectrumServer


def _read_exact(sock_file, n):
    buf = b""
    while len(buf) < n:
        chunk = sock_file.read(n - len(buf))
        if not chunk:
            break
        buf += chunk
    return buf


def test_audio_wav_streams_decodable_pcm():
    q = RateLockedQueue()
    fs = 48000
    t = np.arange(fs) / fs
    tone = (8000.0 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.int16)
    q.put_block(tone)                     # > half fill: startup gate opens

    got_volume = []
    srv = SpectrumServer(port=0, sample_rate=2e6, audio_queue=q,
                         on_volume=got_volume.append).start()
    try:
        # keep the queue fed while we stream
        stop = threading.Event()

        def feeder():
            while not stop.is_set():
                q.put_block(tone[:4800])
                time.sleep(0.05)
        th = threading.Thread(target=feeder, daemon=True)
        th.start()

        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/audio.wav", timeout=10)
        assert resp.headers["Content-Type"] == "audio/wav"
        hdr = _read_exact(resp, 44)
        assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
        fmt = struct.unpack("<IHHIIHH", hdr[16:36])
        assert fmt[1] == 1 and fmt[2] == 1 and fmt[3] == 48000  # PCM mono
        assert hdr[36:40] == b"data"

        # ~0.5 s of paced PCM frames
        pcm = _read_exact(resp, 48000)    # 24000 samples
        stop.set()
        resp.close()
        audio = np.frombuffer(pcm, np.int16).astype(np.float64)
        assert len(audio) == 24000
        spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
        f = np.fft.rfftfreq(len(audio), 1 / 48000.0)
        pk = f[np.argmax(spec)]
        assert abs(pk - 1000.0) < 20.0, pk
        floor = np.median(20 * np.log10(spec + 1e-9))
        assert 20 * np.log10(spec.max()) - floor > 40.0

        # concurrent listeners each get the FULL stream (the single-
        # consumer tee fans out; naive sharing would split samples)
        def read_one(out, tag):
            r2 = urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/audio.wav", timeout=10)
            _read_exact(r2, 44)
            out[tag] = _read_exact(r2, 24000)
            r2.close()
        stop.clear()
        th2 = threading.Thread(target=feeder, daemon=True)
        th2.start()
        outs = {}
        readers = [threading.Thread(target=read_one, args=(outs, k))
                   for k in ("a", "b")]
        for r2 in readers:
            r2.start()
        for r2 in readers:
            r2.join(15)
        stop.set()
        for k, raw in outs.items():
            a2 = np.frombuffer(raw, np.int16).astype(np.float64)
            assert len(a2) == 12000, (k, len(a2))
            s2 = np.abs(np.fft.rfft(a2 * np.hanning(len(a2))))
            pk2 = np.fft.rfftfreq(len(a2), 1 / 48000.0)[np.argmax(s2)]
            assert abs(pk2 - 1000.0) < 30.0, (k, pk2)

        # volume rides POST /volume
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/volume",
            data=json.dumps({"volume": 42}).encode(), method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert out == {"volume": 42} and got_volume == [42]
    finally:
        srv.stop()
