"""ctypes binding for the native C++ UDP ingest (native/ingest.cpp).

Builds the shared library on first use if it isn't present (plain g++, no
external deps).  Falls back gracefully: callers should catch OSError /
RuntimeError and use the asyncio Python receiver (io/netsdr.py) instead —
the native path matters at multi-MSPS rates where per-packet Python work
can't keep up (BASELINE config 5: 20 MSPS).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libcutesdr_ingest.so"
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ingest_create.restype = ctypes.c_void_p
    lib.ingest_create.argtypes = [ctypes.c_uint16, ctypes.c_int]
    lib.ingest_read.restype = ctypes.c_int64
    lib.ingest_read.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int64, ctypes.c_int]
    lib.ingest_read_planes.restype = ctypes.c_int64
    lib.ingest_read_planes.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int64, ctypes.c_int]
    lib.ingest_available.restype = ctypes.c_int64
    lib.ingest_available.argtypes = [ctypes.c_void_p]
    lib.ingest_stats.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_uint64),
                                 ctypes.POINTER(ctypes.c_uint64)]
    lib.ingest_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeIngest:
    """UDP IQ receiver backed by the C++ ring buffer."""

    def __init__(self, port: int, ring_log2: int = 22):
        lib = _load()
        self._lib = lib
        self._h = lib.ingest_create(port, ring_log2)
        if not self._h:
            raise RuntimeError(f"ingest_create failed on port {port}")

    def read(self, n: int, timeout_ms: int = 1000) -> np.ndarray | None:
        """Blocking read of exactly n complex64 samples (None on timeout)."""
        buf = np.empty(2 * n, np.float32)
        got = self._lib.ingest_read(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, timeout_ms)
        if got == 0:
            return None
        return buf.view(np.complex64)

    def read_planes(self, n: int, timeout_ms: int = 1000):
        """Blocking read of n samples as separate (re, im) float32 planes
        (None on timeout) — deinterleaved in the native copy-out; feeds
        ReceiverSession.pump_planes without a host conversion pass."""
        re = np.empty(n, np.float32)
        im = np.empty(n, np.float32)
        got = self._lib.ingest_read_planes(
            self._h, re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, timeout_ms)
        if got == 0:
            return None
        return re, im

    @property
    def available(self) -> int:
        return int(self._lib.ingest_available(self._h))

    def stats(self) -> dict:
        missed = ctypes.c_int64()
        packets = ctypes.c_uint64()
        dropped = ctypes.c_uint64()
        self._lib.ingest_stats(self._h, ctypes.byref(missed),
                               ctypes.byref(packets), ctypes.byref(dropped))
        return {"missed_packets": missed.value, "packets": packets.value,
                "dropped_samples": dropped.value}

    def close(self) -> None:
        if self._h:
            self._lib.ingest_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
