"""I/O plane tests: ASCP codec, stream assembly, AD6620 loader, discovery
wire format, file sources/sinks, rate-locked audio queue, native ingest."""

import asyncio
import socket
import struct
import threading
import time

import numpy as np
import pytest

from cutesdr_tpu.io import ascp, ad6620, audio_sink, discover, filesource
from cutesdr_tpu.io.ascp import AscpMessage, StreamAssembler, ci
from cutesdr_tpu.io.netsdr import (PKT_LENGTH_16, PKT_LENGTH_24,
                                   SequenceTracker, decode_iq_packet)


# ------------------------------------------------------------------ ascp --

def test_ascp_set_item_wire_format():
    # RX_STATE run message: header(2) + citem(2) + 4 params = 8 bytes
    raw = ascp.set_item(ci.RX_STATE, ("u8", ci.RX_STATE_DATACOMPLEX),
                        ("u8", ci.RX_STATE_ON), ("u8", ci.MODE_CONTIGUOUS24),
                        ("u8", 0))
    assert len(raw) == 8
    hdr, item = struct.unpack_from("<HH", raw)
    assert hdr & 0x1FFF == 8                      # 13-bit length
    assert (hdr >> 8) & 0xE0 == ascp.TYPE_HOST_SET_CITEM
    assert item == ci.RX_STATE
    assert raw[4:] == bytes([0x80, 0x02, 0x80, 0x00])


def test_ascp_req_item():
    raw = ascp.req_item(ci.GENERAL_STATUS_CODE)
    hdr, item = struct.unpack_from("<HH", raw)
    assert hdr & 0x1FFF == 4
    assert (hdr >> 8) & 0xE0 == ascp.TYPE_HOST_REQ_CITEM
    assert item == ci.GENERAL_STATUS_CODE


def test_ascp_parse_roundtrip():
    m = AscpMessage(ascp.TYPE_HOST_SET_CITEM)
    m.add_citem(ci.RX_FREQUENCY).add_u8(0).add_u32(14_200_000).add_u8(0)
    raw = m.to_bytes()
    p = AscpMessage.from_bytes(raw)
    assert p.citem() == ci.RX_FREQUENCY
    p.rewind()
    assert p.get_u8() == 0
    assert p.get_u32() == 14_200_000


def test_stream_assembler_split_and_coalesced():
    msgs = [ascp.req_item(ci.GENERAL_STATUS_CODE),
            ascp.set_item(ci.RX_RF_GAIN, ("u8", 0), ("u8", 0xF6)),
            ascp.req_item(ci.GENERAL_INTERFACE_NAME)]
    stream = b"".join(msgs)
    # feed in awkward chunk sizes
    asm = StreamAssembler()
    got = []
    for i in range(0, len(stream), 3):
        got += asm.feed(stream[i:i + 3])
    assert len(got) == 3
    assert got[1].citem() == ci.RX_RF_GAIN


def test_stream_assembler_8192_special_case():
    # a data message with length field 0 means 8194 bytes total
    body = bytes(8192)
    hdr = struct.pack("<H", (0 & 0x1FFF) | (ascp.TYPE_TARG_DATA_ITEM0 << 8))
    asm = StreamAssembler()
    got = asm.feed(hdr + body)
    assert len(got) == 1
    assert got[0].length == 8194


# ---------------------------------------------------------------- ad6620 --

def test_ad6620_load_sequence():
    loader = ad6620.Ad6620Loader("190k")
    msgs = []
    while (m := loader.next_message()) is not None:
        msgs.append(m)
    # 10 control registers + 256 taps + final modectrl
    assert len(msgs) == 11 + 256
    # each message: hdr(2) + adr(2) + data(4) + datah(1) = 9 bytes
    assert all(len(m) == 9 for m in msgs)
    first = AscpMessage.from_bytes(msgs[0])
    assert first.msg_type == ascp.TYPE_HOST_DATA_ITEM1
    adr = struct.unpack_from("<H", first.body, 0)[0]
    assert adr == ad6620.ADR_MODECTRL


def test_ad6620_profiles_sane():
    for name, p in ad6620.PROFILES.items():
        taps = ad6620.design_rcf_taps(p)
        assert len(taps) == p.taps
        assert np.max(np.abs(taps)) <= ad6620.COEF_MAX
        # decimation sanity: 66.67 MHz / total decimation ~ usable bw region
        assert p.total_decimation >= 16


@pytest.mark.parametrize("name", ["5k", "50k", "190k"])
def test_ad6620_rcf_response(name):
    """A decimating filter must attenuate the bands that fold onto the
    passband: k·fs_out ± passband for k=1..rcf_rate/2 — check ≥80 dB there
    and a flat passband."""
    p = ad6620.PROFILES[name]
    h = ad6620.design_rcf_taps(p).astype(np.float64)
    h /= h.sum()
    rcf_in = ad6620.ADC_CLOCK / (p.cic2_rate * p.cic5_rate)
    fs_out = rcf_in / p.rcf_rate
    pass_hz = p.pass_frac * 1e6

    def resp_db(freqs_hz):
        f = np.asarray(freqs_hz) / rcf_in
        w = np.exp(-2j * np.pi * np.outer(f, np.arange(len(h))))
        return 20 * np.log10(np.abs(w @ h) + 1e-300)

    pb = resp_db(np.linspace(0, pass_hz, 50))
    assert pb.max() < 0.5 and pb.min() > -1.0
    for k in range(1, p.rcf_rate // 2 + 1):
        lo = max(k * fs_out - pass_hz, 0.0)
        hi = min(k * fs_out + pass_hz, rcf_in / 2)
        if lo >= hi:
            continue
        alias = resp_db(np.linspace(lo, hi, 50))
        # 50k profile is tap-budget-limited to ~80 dB; others exceed 90
        assert alias.max() < -78.0, (name, k, alias.max())


# -------------------------------------------------------------- discover --

def test_discover_parse_response():
    name = b"NetSDR".ljust(16, b"\0")
    sn = b"XX123456".ljust(16, b"\0")
    ip = bytes([100, 0, 168, 192]) + bytes(12)   # little-endian 192.168.0.100
    msg = struct.pack("<HBBB16s16s16sHB", 88, 0x5A, 0xA5, 1, name, sn, ip,
                      50000, 0)
    msg += bytes(88 - len(msg) - 1) + bytes([0x03])   # status: conn+running
    dev = discover.parse_response(msg)
    assert dev is not None
    assert dev.name == "NetSDR"
    assert dev.serial == "XX123456"
    assert dev.ip == "192.168.0.100"
    assert dev.port == 50000
    assert dev.status_connected and dev.status_running


def test_discover_rejects_bad_key():
    assert discover.parse_response(bytes(56)) is None


# ------------------------------------------------------------- udp decode --

def _make_pkt24(seq, values24):
    payload = b""
    for v in values24:
        payload += int(v & 0xFFFFFF).to_bytes(3, "little")
    pkt = struct.pack("<HH", 0x8404, seq) + payload
    assert len(pkt) == PKT_LENGTH_24, len(pkt)
    return pkt


def test_decode_24bit_packet():
    vals = []
    for i in range(240):
        vals += [i * 256, (0x1000000 - i * 256) & 0xFFFFFF]   # I=+i, Q=-i
    pkt = _make_pkt24(7, vals)
    seq, iq = decode_iq_packet(pkt)
    assert seq == 7
    assert len(iq) == 240
    np.testing.assert_allclose(iq.real[:10], np.arange(10), atol=1e-5)
    np.testing.assert_allclose(iq.imag[1:10], -np.arange(1, 10), atol=1e-5)


def test_decode_16bit_packet():
    data = np.zeros(512, "<i2")
    data[0::2] = np.arange(256)         # I
    data[1::2] = -np.arange(256)        # Q
    pkt = struct.pack("<HH", 0x8204, 3) + data.tobytes()
    assert len(pkt) == PKT_LENGTH_16
    seq, iq = decode_iq_packet(pkt)
    assert seq == 3
    np.testing.assert_allclose(iq.real, np.arange(256))
    np.testing.assert_allclose(iq.imag, -np.arange(256))


def test_sequence_tracker_counts_gaps():
    t = SequenceTracker()
    for s in [0, 1, 2, 5, 6]:      # dropped 3,4
        t.update(s)
    assert t.missed == 2


# ------------------------------------------------------------- filesource --

def test_filesource_int16_roundtrip(tmp_path):
    path = str(tmp_path / "cap.raw")
    iq = (np.arange(100) - 50 + 1j * (np.arange(100))).astype(np.complex64)
    w = filesource.RawIQWriter(path, "int16")
    w.write(iq)
    w.close()
    src = filesource.FileSource(path, "int16")
    got = src.next_block(100)
    np.testing.assert_allclose(got, iq)
    assert src.next_block(10) is None


def test_filesource_npy_loop(tmp_path):
    path = str(tmp_path / "cap.npy")
    iq = np.exp(1j * np.linspace(0, 3, 64)).astype(np.complex64)
    np.save(path, iq)
    src = filesource.FileSource(path, "npy", loop=True)
    a = src.next_block(64)
    b = src.next_block(64)
    np.testing.assert_allclose(a, b)


@pytest.mark.parametrize("fmt,header", [("sv", 0x7E), ("perseus", 0x7A)])
def test_filesource_legacy_capture_formats(fmt, header, tmp_path):
    """SV/Perseus playback: fixed header skipped, int24 LE payload /256
    (reference: 3 bytes into an int32's high bytes then /65536 —
    gui/testbench.cpp:367-395), loop re-seeks past the header."""
    path = str(tmp_path / f"cap.{fmt}")
    vals = np.array([1 << 8, -(1 << 8), 123456, -654321, 0, 255], np.int32)
    iq = (vals[0::2] + 1j * vals[1::2]).astype(np.complex64) / 256.0
    payload = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    with open(path, "wb") as f:
        f.write(b"\xab" * header)      # junk header of the documented size
        f.write(payload)
    src = filesource.FileSource(path, fmt, loop=True)
    got = src.next_block(3)
    np.testing.assert_allclose(got, iq)
    got2 = src.next_block(3)           # loop: header skipped again
    np.testing.assert_allclose(got2, iq)


def test_wav_sink(tmp_path):
    import wave
    path = str(tmp_path / "out.wav")
    with filesource.WavSink(path, 48000) as w:
        w.write(np.full(480, 1000.0))
    with wave.open(path) as r:
        assert r.getframerate() == 48000
        assert r.getnframes() == 480


# ------------------------------------------------------------- audio sink --

def test_rate_locked_queue_startup_and_flow():
    q = audio_sink.RateLockedQueue()
    # during startup: silence until half full
    assert np.all(q.get(100) == 0)
    q.put_block(np.full(audio_sink.OUTQSIZE // 2 + 100, 7, np.int16))
    out = q.get(100)
    assert np.all(out == 7)
    assert q.underflows == 0


def test_rate_locked_queue_p_controller():
    q = audio_sink.RateLockedQueue()
    q.put_block(np.ones(audio_sink.OUTQSIZE // 2 + 200, np.int16))
    q.get(10)   # leaves startup
    # drain below half: correction must go negative (queue low -> consumer
    # too fast -> produce more by lowering the decimation ratio)
    # drain well below half; the depth EMA (alpha .001 per call) needs many
    # get calls to track down
    for _ in range(500):
        q.get(10)
    q._samples_since_update = 10 ** 9
    q.get(10)
    assert q.rate_correction < 0
    assert q.ppm_error == int(q.rate_correction * 1e6)


def test_rate_locked_queue_overflow_self_heals():
    q = audio_sink.RateLockedQueue()
    for _ in range(5):
        q.put_block(np.zeros(6000, np.int16))
    assert q.overflows >= 1
    assert 0 <= q.level < audio_sink.OUTQSIZE


# ---------------------------------------------------------- native ingest --

def test_native_ingest_loopback():
    pytest.importorskip("ctypes")
    from cutesdr_tpu.io.native_ingest import NativeIngest

    port = 48765
    with NativeIngest(port, ring_log2=16) as ing:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # 16-bit data packets: 1028 bytes = 4 header + 256 complex samples
        data = np.zeros(512, "<i2")
        data[0::2] = np.arange(256)
        data[1::2] = 2 * np.arange(256)
        for seq in range(1, 5):
            pkt = struct.pack("<HH", 0x8204, seq) + data.tobytes()
            sock.sendto(pkt, ("127.0.0.1", port))
        got = ing.read(4 * 256, timeout_ms=3000)
        assert got is not None
        got = got.reshape(4, 256)
        for row in got:
            np.testing.assert_allclose(row.real, np.arange(256))
            np.testing.assert_allclose(row.imag, 2 * np.arange(256))
        stats = ing.stats()
        assert stats["packets"] == 4
        assert stats["missed_packets"] in (0, 1)   # seq started at 1
        sock.close()




def test_native_ingest_read_planes_loopback():
    """The native deinterleaved plane read (ingest_read_planes): same data
    as read(), delivered as separate f32 planes for pump_planes."""
    from cutesdr_tpu.io.native_ingest import NativeIngest

    port = 48766
    with NativeIngest(port, ring_log2=16) as ing:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        data = np.zeros(512, "<i2")
        data[0::2] = np.arange(256)
        data[1::2] = -np.arange(256)
        for seq in range(1, 4):
            pkt = struct.pack("<HH", 0x8204, seq) + data.tobytes()
            sock.sendto(pkt, ("127.0.0.1", port))
        got = ing.read_planes(3 * 256, timeout_ms=3000)
        assert got is not None
        re, im = got
        assert re.dtype == np.float32 and im.dtype == np.float32
        np.testing.assert_allclose(re.reshape(3, 256)[1], np.arange(256))
        np.testing.assert_allclose(im.reshape(3, 256)[1], -np.arange(256))
        assert ing.read_planes(256, timeout_ms=50) is None   # drained
        sock.close()


def test_cli_run_from_native_udp_planes(tmp_path):
    """`cli run --source udp:PORT` end-to-end through the native ingest's
    plane path: a tone streamed as 16-bit ASCP packets comes out of the
    WAV at the expected audio frequency."""
    import threading
    import wave

    from cutesdr_tpu import cli

    fs = 250_000.0
    port = 48767
    stop = threading.Event()

    def feeder():
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        phase = 0
        seq = 1
        while not stop.is_set():
            n = 256
            t = phase + np.arange(n)
            iq = 3000.0 * np.exp(2j * np.pi * 11_000.0 / fs * t)
            phase += n
            data = np.empty(2 * n, "<i2")
            data[0::2] = np.round(iq.real)
            data[1::2] = np.round(iq.imag)
            sock.sendto(struct.pack("<HH", 0x8204, seq & 0xFFFF)
                        + data.tobytes(), ("127.0.0.1", port))
            seq += 1
            time.sleep(0.0008)     # ~320 kSPS feed rate

    th = threading.Thread(target=feeder, daemon=True)
    out = str(tmp_path / "udp.wav")
    th.start()
    try:
        rc = cli.main(["run", "--source", f"udp:{port}", "--fs", "250000",
                       "--mode", "usb", "--freq", "10000",
                       "--seconds", "0.4", "--out", out])
    finally:
        stop.set()
    assert rc == 0
    with wave.open(out) as w:
        n = w.getnframes()
        assert n > 0
        audio = np.frombuffer(w.readframes(n), np.int16).astype(np.float64)
    a = audio[len(audio) // 2:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = np.fft.rfftfreq(len(a), 1 / 48000.0)[int(np.argmax(spec))]
    assert abs(f_pk - 1000.0) < 50.0, f_pk


# ----------------------------------------------------------- sdr client ---

class FakeRadio:
    """Minimal ASCP-speaking fake NetSDR over TCP for client tests."""

    def __init__(self):
        self.received: list[AscpMessage] = []
        self.port = None
        self.mute = False          # True -> stop acking (dead-radio test)
        self._server = None

    async def start(self):
        self._server = await asyncio.start_server(self._handle,
                                                  "127.0.0.1", 0)
        self.port = self._server.sockets[0].getsockname()[1]

    async def _handle(self, reader, writer):
        asm = StreamAssembler()
        while True:
            data = await reader.read(1024)
            if not data:
                return
            for msg in asm.feed(data):
                self.received.append(msg)
                await self._respond(msg, writer)

    async def _respond(self, msg, writer):
        if self.mute:
            return
        if msg.msg_type == ascp.TYPE_HOST_REQ_CITEM:
            item = msg.citem()
            if item == ci.GENERAL_INTERFACE_NAME:
                m = AscpMessage(ascp.TYPE_TARG_RESP_CITEM)
                m.add_citem(item)
                m.body += b"NetSDR\0"
                writer.write(m.to_bytes())
            elif item == ci.GENERAL_STATUS_CODE:
                m = AscpMessage(ascp.TYPE_TARG_RESP_CITEM)
                m.add_citem(item).add_u8(ci.STATUS_IDLE)
                writer.write(m.to_bytes())
            await writer.drain()


def test_sdr_client_handshake_and_start():
    from cutesdr_tpu.io.netsdr import SdrClient, Status

    async def scenario():
        radio = FakeRadio()
        await radio.start()
        client = SdrClient(host="127.0.0.1", port=radio.port)
        await client.connect()
        await asyncio.sleep(0.2)
        assert client.device_name == "NetSDR"
        client.start()
        await asyncio.sleep(0.2)
        # the start burst must include chan setup, rf filter, ad modes,
        # sync, pulse, sample rate, rx state
        items = [m.citem() for m in radio.received
                 if m.msg_type == ascp.TYPE_HOST_SET_CITEM
                 and len(m.body) >= 2]
        for expect in (ci.RX_CHAN_SETUP, ci.RX_RF_FILTER, ci.RX_AD_MODES,
                       ci.RX_OUT_SAMPLE_RATE, ci.RX_STATE, ci.RX_RF_GAIN):
            assert expect in items, hex(expect)
        assert client.status == Status.RUNNING
        await client.close()

    asyncio.run(scenario())


def test_sdr_client_keepalive_reconnect():
    """Radio goes silent mid-stream: after 2 missed keepalive acks the
    client must tear the stream down, re-enter the backoff connect loop and
    resume the stream on reconnect — the reference's TCP thread behavior
    (interface/sdrinterface.cpp:692-703 + netiobase.cpp:309-328)."""
    from cutesdr_tpu.io.netsdr import SdrClient, Status

    async def scenario():
        radio = FakeRadio()
        await radio.start()
        statuses = []
        client = SdrClient(host="127.0.0.1", port=radio.port,
                           on_status=statuses.append)
        await client.connect(reconnect_delay=0.05, keepalive_period=0.05)
        await asyncio.sleep(0.2)
        client.start()
        assert client.status == Status.RUNNING

        def rx_state_on_count():
            n = 0
            for m in radio.received:
                if (m.msg_type == ascp.TYPE_HOST_SET_CITEM
                        and len(m.body) >= 4 and m.citem() == ci.RX_STATE):
                    if m.body[3] == ci.RX_STATE_ON:
                        n += 1
            return n

        await asyncio.sleep(0.1)
        n_starts_before = rx_state_on_count()
        assert n_starts_before >= 1

        radio.mute = True               # radio stops acking keepalives
        await asyncio.sleep(0.6)        # > 3 keepalive periods + backoff
        assert Status.ERROR in statuses  # link declared dead
        radio.mute = False              # radio comes back
        await asyncio.sleep(0.6)

        assert client.reconnects >= 1
        assert client.status == Status.RUNNING          # stream resumed
        assert rx_state_on_count() > n_starts_before    # re-sent start burst
        await client.close()
        assert client.status == Status.NOT_CONNECTED

    asyncio.run(scenario())


def test_sdr_client_tcp_drop_reconnect():
    """A hard TCP drop (EOF) must also trigger the reconnect loop."""
    from cutesdr_tpu.io.netsdr import SdrClient, Status

    async def scenario():
        radio = FakeRadio()
        await radio.start()
        client = SdrClient(host="127.0.0.1", port=radio.port)
        await client.connect(reconnect_delay=0.05, keepalive_period=10.0)
        await asyncio.sleep(0.2)
        client.start()
        client._writer.transport.abort()   # hard connection drop
        await asyncio.sleep(0.6)
        assert client.reconnects >= 1
        assert client.status == Status.RUNNING   # stream resumed
        await client.close()

    asyncio.run(scenario())


def test_sdr_client_frequency_clamp():
    from cutesdr_tpu.io.netsdr import SdrClient

    c = SdrClient()
    c._writer = None
    c.base_freq_max = 30_000_000
    c.option_freq_min = 100_000_000
    c.option_freq_max = 120_000_000
    c.current_frequency = 10_000_000
    # inside the gap moving up from below -> jumps to option range bottom
    assert c.set_frequency(50_000_000) == 100_000_000
    # inside the gap moving down from above -> jumps to base range top
    assert c.set_frequency(50_000_000) == 30_000_000
    # above everything -> clamps to option max
    assert c.set_frequency(500_000_000) == 120_000_000


def test_sdr_client_ad6620_ack_pump():
    """SDR-IQ bandwidth change: the register-load sequence must be paced by
    data-item acks (interface/sdrinterface.cpp:376-380)."""
    from cutesdr_tpu.io.netsdr import RadioType, SdrClient

    sent = []

    class W:
        def write(self, b):
            sent.append(bytes(b))

    c = SdrClient()
    c.radio_type = RadioType.SDRIQ
    c._writer = W()
    c.set_bandwidth_index(0)
    assert len(sent) == 1           # first register write goes out

    ack = AscpMessage(ascp.TYPE_DATA_ITEM_ACK)
    ack.add_u8(1)                   # AD6620 load ack
    total = 1
    while c._ad6620 is not None and total < 1000:
        c._parse_message(AscpMessage.from_bytes(ack.to_bytes()))
        total = len(sent)
    # 11 control registers + 256 taps
    assert total == 11 + 256
    assert c._ad6620 is None        # load complete
    # sample rate follows the SDR-IQ table
    assert abs(c.sample_rate - 66666666.6667 / 1200.0) < 1.0


def test_spur_cal_block_update_matches_per_sample_loop():
    """SdrClient._spur_calibrate's block-exponential form must equal the
    reference's per-sample recurrence s' = (1-a)s + a*x
    (interface/sdrinterface.cpp:826-848)."""
    from cutesdr_tpu.io.netsdr import SdrClient

    rng = np.random.default_rng(3)
    iq = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
          + (1.25 - 0.5j)).astype(np.complex64)
    c = SdrClient()
    c._start_spur_cal()
    c._spur_calibrate(iq[:3000])
    c._spur_calibrate(iq[3000:])

    a = 1.0 / 100000.0
    si = sq = 0.0
    for x in iq:
        si = (1.0 - a) * si + a * float(x.real)
        sq = (1.0 - a) * sq + a * float(x.imag)
    assert abs(c.spur_offsets[0] - si) < 1e-6 * max(1.0, abs(si))
    assert abs(c.spur_offsets[1] - sq) < 1e-6 * max(1.0, abs(sq))


def test_apply_spur_cal_feeds_receiver_dc_offset():
    from cutesdr_tpu.cli import _apply_spur_cal

    class FakeClient:
        spur_offsets = (0.5, -0.25)

    class FakeSource:
        client = FakeClient()

    calls = []

    class FakeRx:
        def set_dc_offset(self, i, q):
            calls.append((i, q))

    src, rx = FakeSource(), FakeRx()
    _apply_spur_cal(src, rx)
    _apply_spur_cal(src, rx)          # unchanged: no second call
    assert calls == [(0.5, -0.25)]


def test_unsolicited_ad_overload_latches_flag():
    """Unsolicited STATUS_ADOVERLOAD latches client.ad_overload for the UI
    transient (interface/sdrinterface.cpp:346-357)."""
    from cutesdr_tpu.io import ascp as A
    from cutesdr_tpu.io.ascp import AscpMessage, ci
    from cutesdr_tpu.io.netsdr import SdrClient, Status

    c = SdrClient()
    m = AscpMessage(A.TYPE_TARG_UNSOLICITED_CITEM)
    m.add_citem(ci.GENERAL_STATUS_CODE)
    m.add_u8(ci.STATUS_ADOVERLOAD)
    c._parse_message(AscpMessage.from_bytes(m.to_bytes()))
    assert c.ad_overload is True
    assert c.status == Status.ADOVR
