"""Full-stack integration: a fake NetSDR (TCP control + UDP data) streams a
tone; SdrClient drives the handshake/start sequence; the session demodulates
to audio.  This exercises ascp + netsdr + session + pipeline together over
real sockets."""

import asyncio
import socket
import struct

import numpy as np
import pytest

from cutesdr_tpu.io import ascp
from cutesdr_tpu.io.ascp import AscpMessage, StreamAssembler, ci
from cutesdr_tpu.io.netsdr import SdrClient, Status
from cutesdr_tpu.pipeline.receiver import ReceiverConfig
from cutesdr_tpu.session import ReceiverSession


class FakeNetSdr:
    """Speaks enough ASCP to complete the handshake and, once started,
    streams 16-bit IQ data packets of a tone over UDP."""

    def __init__(self, tone_hz=10_000.0, fs=500_000.0, amp=3000.0,
                 n_packets=40, rx2_gain=0.8 * np.exp(1j * np.radians(40.0))):
        self.tone_hz, self.fs, self.amp = tone_hz, fs, amp
        self.n_packets = n_packets
        # channel-2 complex mismatch streamed in the dual modes (the MRC
        # combiner should estimate this)
        self.rx2_gain = rx2_gain
        self.chan_setup = ci.CHAN_SETUP_SINGLE_1
        self.port = None
        self._udp_peer = None
        self._streaming = False
        self._seq = 0   # devices start the sequence at 0 (resync marker)
        self._phase = 0.0
        self._server = None
        self._stream_task = None

    async def start(self):
        self._server = await asyncio.start_server(self._handle, "127.0.0.1", 0)
        self.port = self._server.sockets[0].getsockname()[1]
        self._udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    async def stop(self):
        if self._stream_task:
            self._stream_task.cancel()
        self._server.close()

    async def _handle(self, reader, writer):
        self._udp_peer = ("127.0.0.1", self.port)
        asm = StreamAssembler()
        while True:
            data = await reader.read(1024)
            if not data:
                return
            for msg in asm.feed(data):
                await self._respond(msg, writer)

    async def _respond(self, msg, writer):
        if msg.msg_type == ascp.TYPE_HOST_REQ_CITEM:
            item = msg.citem()
            m = AscpMessage(ascp.TYPE_TARG_RESP_CITEM)
            m.add_citem(item)
            if item == ci.GENERAL_INTERFACE_NAME:
                m.body += b"NetSDR\0"
            elif item == ci.GENERAL_INTERFACE_SERIALNUM:
                m.body += b"FAKE0001\0"
            elif item == ci.GENERAL_HARDFIRM_VERSION:
                msg.rewind()
                m.add_u8(msg.get_u8()).add_u16(123)
            elif item == ci.GENERAL_STATUS_CODE:
                m.add_u8(ci.STATUS_IDLE)
            writer.write(m.to_bytes())
            await writer.drain()
        elif msg.msg_type == ascp.TYPE_HOST_SET_CITEM:
            item = msg.citem()
            if item == ci.RX_CHAN_SETUP:
                msg.rewind()
                self.chan_setup = msg.get_u8()
            if item == ci.RX_STATE:
                msg.rewind()
                msg.get_u8()
                run = msg.get_u8()
                if run == ci.RX_STATE_ON and not self._streaming:
                    self._streaming = True
                    self._stream_task = asyncio.ensure_future(self._stream())
                elif run == ci.RX_STATE_IDLE:
                    self._streaming = False
            # echo the set as a response (devices ack sets)
            writer.write(msg.to_bytes())
            await writer.drain()

    async def _stream(self):
        """Send n_packets 1028-byte 16-bit packets: 256 tone samples, or —
        in the dual channel modes — 128 samples per channel interleaved
        I1 Q1 I2 Q2 with ch2 = rx2_gain·ch1 (the NetSDR dual payload
        layout, interface/protocoldefs.h:143-152)."""
        dual = self.chan_setup in (ci.CHAN_SETUP_DUAL_AD1,
                                   ci.CHAN_SETUP_DUAL_AD2,
                                   ci.CHAN_SETUP_DUAL_AD12)
        for _ in range(self.n_packets):
            if dual:
                n = 128
                t = self._phase + np.arange(n)
                ch1 = self.amp * np.exp(
                    2j * np.pi * self.tone_hz / self.fs * t)
                ch2 = self.rx2_gain * ch1
                data = np.empty(4 * n, "<i2")
                data[0::4] = np.round(ch1.real)
                data[1::4] = np.round(ch1.imag)
                data[2::4] = np.round(ch2.real)
                data[3::4] = np.round(ch2.imag)
            else:
                n = 256
                t = self._phase + np.arange(n)
                iq = self.amp * np.exp(
                    2j * np.pi * self.tone_hz / self.fs * t)
                data = np.empty(2 * n, "<i2")
                data[0::2] = np.round(iq.real)
                data[1::2] = np.round(iq.imag)
            self._phase += n
            pkt = struct.pack("<HH", 0x8204, self._seq & 0xFFFF) + data.tobytes()
            self._seq += 1
            self._udp.sendto(pkt, self._udp_peer)
            await asyncio.sleep(0.002)


@pytest.mark.slow
def test_fake_radio_to_audio():
    fs = 500_000.0
    tone_hz = 10_000.0 + 1000.0     # 1 kHz above the tune frequency

    async def scenario():
        radio = FakeNetSdr(tone_hz=tone_hz, fs=fs)
        await radio.start()

        cfg = ReceiverConfig(input_rate=fs, mode="usb",
                             tune_freq=10_000.0, audio_rate=None,
                             frames_per_block=1)
        sess = ReceiverSession(cfg)
        sess.start()

        client = SdrClient(host="127.0.0.1", port=radio.port,
                           on_iq=lambda iq: sess.pump(iq))
        await client.connect()
        await asyncio.sleep(0.3)
        assert client.device_name == "NetSDR"
        client.start()
        # stream 40*256 = 10240 samples < block... need more packets; loop
        # (poll for DELIVERED audio — with pipeline_depth=2 the newest
        # step stays in flight until the next block lands)
        for _ in range(12):
            await asyncio.sleep(0.15)
            if sess.metrics.audio_samples_out > 0:
                break
        sess.flush()
        await client.close()
        await radio.stop()
        return sess, client

    sess, client = asyncio.run(scenario())
    # at least one pipeline block must have run; S-meter sees the tone
    assert sess.metrics.blocks >= 1
    assert sess.metrics.smeter_ave_db > -60.0
    assert client.missed_packets == 0
    # audio queue accumulated demodulated samples
    assert sess.audio_queue.level > 0


@pytest.mark.slow
def test_cli_run_from_live_radio(tmp_path):
    """`cli run --source radio:HOST:PORT` — the reference's primary
    workflow (connect -> tune -> demodulate -> audio) end-to-end through
    the CLI: fake NetSDR at bandwidth-index 1 (250 kSPS), tone 1 kHz above
    the tune frequency, WAV out."""
    import threading
    import wave

    from cutesdr_tpu import cli

    fs = 250_000.0                       # NetSDR bw-index 1 table rate
    radio_box = {}
    started = threading.Event()

    def radio_thread():
        async def main():
            radio = FakeNetSdr(tone_hz=11_000.0, fs=fs, n_packets=2000)
            await radio.start()
            radio_box["port"] = radio.port
            radio_box["stop"] = stop = asyncio.Event()
            started.set()
            await stop.wait()
            await radio.stop()

        asyncio.run(main())

    t = threading.Thread(target=radio_thread, daemon=True)
    t.start()
    assert started.wait(10.0)

    out = str(tmp_path / "radio.wav")
    # --center 0: the fake's tone is at an absolute baseband frequency (it
    # ignores set_frequency), so the demod tune is the full 10 kHz offset.
    # Without --center the CLI would center the radio ON the station and
    # tune the NCO to baseband 0 (the real-radio algebra).
    rc = cli.main(["run", "--source", f"radio:127.0.0.1:{radio_box['port']}",
                   "--radio-type", "netsdr", "--bw-index", "1",
                   "--mode", "usb", "--freq", "10000", "--center", "0",
                   "--seconds", "0.4", "--out", out])
    radio_box["stop"].set()
    assert rc == 0

    with wave.open(out) as w:
        n = w.getnframes()
        assert n > 0
        audio = np.frombuffer(w.readframes(n), np.int16).astype(np.float64)
    # skip the settling head, then the tone must dominate at ~1 kHz
    a = audio[len(audio) // 2:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = np.fft.rfftfreq(len(a), 1 / 48000.0)[int(np.argmax(spec))]
    assert abs(f_pk - 1000.0) < 50.0, f_pk


def test_radio_center_tune_algebra():
    """--freq is the absolute RF station; the radio centers on --center
    (default: the station) and the pipeline NCO mixes only the baseband
    remainder (gui/mainwindow.cpp:835-841 algebra)."""
    import argparse

    from cutesdr_tpu.cli import _apply_radio_rate

    def mk(**kw):
        return argparse.Namespace(source="radio:h", radio_type="netsdr",
                                  bw_index=1, fs=2e6, **kw)

    a = mk(freq=7_100_000.0, center=None)     # center on the station
    _apply_radio_rate(a)
    assert a.center == 7_100_000.0 and a.freq == 0.0 and a.fs == 250_000.0

    a = mk(freq=7_101_000.0, center=7_100_000.0)   # explicit center
    _apply_radio_rate(a)
    assert a.freq == 1000.0

    a = mk(freq=8_000_000.0, center=7_000_000.0)   # outside the band
    with pytest.raises(SystemExit):
        _apply_radio_rate(a)


@pytest.mark.slow
def test_cli_run_dual_channel_from_live_radio(tmp_path):
    """`cli run --dual --source radio:...` drives CHAN_SETUP_DUAL_AD12
    end-to-end: the fake NetSDR streams interleaved two-channel packets
    with a ch2 mismatch of 0.8∠40°, decode_iq_packet_dual splits them,
    the MRC DiversityReceiver estimates the mismatch and combines, and the
    demodulated WAV carries the tone (VERDICT r2 item 7 — the reference
    defines the dual protocol but never demodulates channel 2)."""
    import threading
    import wave

    from cutesdr_tpu import cli

    fs = 250_000.0
    radio_box = {}
    started = threading.Event()

    def radio_thread():
        async def main():
            radio = FakeNetSdr(tone_hz=11_000.0, fs=fs, n_packets=4000)
            await radio.start()
            radio_box["port"] = radio.port
            radio_box["radio"] = radio
            radio_box["stop"] = stop = asyncio.Event()
            started.set()
            await stop.wait()
            await radio.stop()

        asyncio.run(main())

    t = threading.Thread(target=radio_thread, daemon=True)
    t.start()
    assert started.wait(10.0)

    out = str(tmp_path / "dual.wav")
    rc = cli.main(["run", "--dual",
                   "--source", f"radio:127.0.0.1:{radio_box['port']}",
                   "--radio-type", "netsdr", "--bw-index", "1",
                   "--mode", "usb", "--freq", "10000", "--center", "0",
                   "--seconds", "0.4", "--out", out])
    radio_box["stop"].set()
    assert rc == 0
    # the fake honored the dual channel-setup command
    assert radio_box["radio"].chan_setup == ci.CHAN_SETUP_DUAL_AD12

    with wave.open(out) as w:
        n = w.getnframes()
        assert n > 0
        audio = np.frombuffer(w.readframes(n), np.int16).astype(np.float64)
    a = audio[len(audio) // 2:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = np.fft.rfftfreq(len(a), 1 / 48000.0)[int(np.argmax(spec))]
    assert abs(f_pk - 1000.0) < 50.0, f_pk


def test_diversity_combiner_estimates_fake_radio_mismatch():
    """SdrClient dual data plane -> DiversitySession: the combiner's gain
    estimate converges to the fake's rx2 mismatch (0.8∠40°) and audio
    flows."""
    fs = 500_000.0

    async def scenario():
        radio = FakeNetSdr(tone_hz=11_000.0, fs=fs, n_packets=1000)
        await radio.start()

        from cutesdr_tpu.io.ascp import ci as _ci
        from cutesdr_tpu.session import DiversitySession

        cfg = ReceiverConfig(input_rate=fs, mode="usb",
                             tune_freq=10_000.0, audio_rate=None,
                             frames_per_block=1)
        sess = DiversitySession(cfg, smoothing_blocks=2.0)
        sess.start()

        client = SdrClient(
            host="127.0.0.1", port=radio.port,
            on_iq_dual=lambda a, b: sess.pump(np.stack([a, b])))
        client.channel_mode = _ci.CHAN_SETUP_DUAL_AD12
        await client.connect()
        await asyncio.sleep(0.3)
        client.start()
        client.set_rx2_parameters(1.0, 0.0)     # balance burst goes out
        for _ in range(30):
            await asyncio.sleep(0.15)
            if sess.metrics.blocks >= 8:
                break
        await client.close()
        await radio.stop()
        return sess

    sess = asyncio.run(scenario())
    assert sess.metrics.blocks >= 8
    g = sess.gain
    assert abs(abs(g) - 0.8) < 0.1, g
    assert abs(np.degrees(np.angle(g)) - 40.0) < 8.0, g
    assert sess.metrics.audio_samples_out > 0
    assert "rx2 gain" in sess.status_line()
