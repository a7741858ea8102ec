"""Sound-card sink tests with an injected fake PortAudio backend.

The container has no audio hardware (and no sounddevice package), so the
backend is faked: the fake OutputStream drives the real callback the way
PortAudio's audio thread would, which exercises the queue drain, the
half-fill startup gate, and the rate-lock estimate end-to-end.
"""

import numpy as np
import pytest

from cutesdr_tpu.io.audio_device import SoundCardSink, available
from cutesdr_tpu.io.audio_sink import RateLockedQueue


class FakeStream:
    def __init__(self, samplerate, channels, dtype, blocksize, device,
                 callback):
        assert dtype == "int16"
        self.samplerate = samplerate
        self.channels = channels
        self.blocksize = blocksize
        self.callback = callback
        self.started = False
        self.closed = False

    def start(self):
        self.started = True

    def stop(self):
        self.started = False

    def close(self):
        self.closed = True

    def pull(self, frames):
        """What the PortAudio audio thread does each period."""
        out = np.zeros((frames, self.channels), np.int16)
        self.callback(out, frames, None, None)
        return out


class FakeBackend:
    def OutputStream(self, **kw):
        self.stream = FakeStream(**kw)
        return self.stream


def test_soundcard_unavailable_raises_clear_error(monkeypatch):
    import cutesdr_tpu.io.audio_device as ad
    monkeypatch.setattr(ad, "_import_sounddevice", lambda: None)
    assert not available()
    with pytest.raises(RuntimeError, match="sounddevice"):
        SoundCardSink(RateLockedQueue())


def test_soundcard_drains_queue_mono():
    q = RateLockedQueue(stereo=False)
    be = FakeBackend()
    sink = SoundCardSink(q, 48000, _backend=be)
    with sink:
        assert be.stream.started
        # before half-fill: silence
        out = be.stream.pull(256)
        assert not out.any()
        # fill past the startup gate with a ramp
        ramp = np.arange(q.size // 2 + 512, dtype=np.int16)
        q.put_block(ramp)
        out = be.stream.pull(256)
        np.testing.assert_array_equal(out[:, 0], ramp[:256])
        out = be.stream.pull(256)
        np.testing.assert_array_equal(out[:, 0], ramp[256:512])
        assert sink.frames_played == 3 * 256
    assert be.stream.closed


def test_soundcard_stereo_shape():
    q = RateLockedQueue(stereo=True)
    be = FakeBackend()
    sink = SoundCardSink(q, 48000, _backend=be).start()
    blk = np.stack([np.arange(q.size // 2 + 64),
                    -np.arange(q.size // 2 + 64)], axis=-1).astype(np.int16)
    q.put_block(blk)
    out = be.stream.pull(64)
    assert out.shape == (64, 2)
    np.testing.assert_array_equal(out, blk[:64])
    sink.stop()


def test_soundcard_underflow_self_heals():
    """Draining an emptying queue must keep returning audio (quarter-queue
    rewind) rather than raising — the audio thread can never be blocked."""
    q = RateLockedQueue(stereo=False)
    be = FakeBackend()
    SoundCardSink(q, 48000, _backend=be).start()
    q.put_block(np.ones(q.size // 2 + 256, np.int16))
    drained = 0
    for _ in range(40):
        be.stream.pull(1024)
        drained += 1024
    assert q.underflows > 0   # healed, not crashed
