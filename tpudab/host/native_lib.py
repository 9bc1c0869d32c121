"""ctypes loader for the native host library (builds on demand via make).

Exposes: RingBuffer (SPSC blocking ring), IQReader (background file reader
thread in C), and raw codec shim handles consumed by tpudab.audio.codecs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_NATIVE = os.path.join(_DIR, "native")
_LIB_PATH = os.path.join(_NATIVE, "build", "libtpudab_host.so")

_lib = None
_lib_lock = threading.Lock()


def build_native(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE] + (["clean", "all"] if force else ["all"]),
                       check=True, capture_output=True)
    return _LIB_PATH


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is None:
            lib = ctypes.CDLL(build_native())
            c = ctypes.c_void_p
            lib.dab_ring_create.restype = c
            lib.dab_ring_create.argtypes = [ctypes.c_size_t]
            lib.dab_ring_write.restype = ctypes.c_long
            lib.dab_ring_write.argtypes = [c, ctypes.c_char_p, ctypes.c_size_t]
            lib.dab_ring_read.restype = ctypes.c_long
            lib.dab_ring_read.argtypes = [c, ctypes.c_void_p, ctypes.c_size_t]
            lib.dab_ring_fill.restype = ctypes.c_size_t
            lib.dab_ring_fill.argtypes = [c]
            lib.dab_ring_close.argtypes = [c]
            lib.dab_ring_destroy.argtypes = [c]
            lib.dab_iq_reader_start.restype = c
            lib.dab_iq_reader_start.argtypes = [ctypes.c_char_p, ctypes.c_int, c]
            lib.dab_iq_reader_done.restype = ctypes.c_int
            lib.dab_iq_reader_done.argtypes = [c]
            lib.dab_iq_reader_join.argtypes = [c]
            lib.dab_tcp_source_start.restype = c
            lib.dab_tcp_source_start.argtypes = [
                ctypes.c_char_p, ctypes.c_int, c, ctypes.c_uint32,
                ctypes.c_uint32]
            lib.dab_tcp_set_freq.restype = ctypes.c_int
            lib.dab_tcp_set_freq.argtypes = [c, ctypes.c_uint32]
            lib.dab_tcp_source_done.restype = ctypes.c_int
            lib.dab_tcp_source_done.argtypes = [c]
            lib.dab_tcp_tuner_type.restype = ctypes.c_uint32
            lib.dab_tcp_tuner_type.argtypes = [c]
            lib.dab_tcp_source_stop.argtypes = [c]
            lib.dab_decoder_open.restype = c
            lib.dab_decoder_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                             ctypes.c_int]
            lib.dab_decoder_decode.restype = ctypes.c_int
            lib.dab_decoder_decode.argtypes = [
                c, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.dab_decoder_close.argtypes = [c]
            lib.dab_encoder_open.restype = c
            lib.dab_encoder_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_int]
            lib.dab_encoder_frame_size.restype = ctypes.c_int
            lib.dab_encoder_frame_size.argtypes = [c]
            lib.dab_encoder_encode.restype = ctypes.c_int
            lib.dab_encoder_encode.argtypes = [c, ctypes.c_void_p, ctypes.c_int,
                                               ctypes.c_void_p, ctypes.c_int]
            lib.dab_encoder_close.argtypes = [c]
            _lib = lib
    return _lib


IQ_FORMATS = {"u8": 0, "s8": 1, "s16": 2, "f32": 3}


class RingBuffer:
    """Blocking SPSC byte ring (native). Reference: ThreadedRingBuffer."""

    def __init__(self, capacity: int):
        self._lib = get_lib()
        self._h = self._lib.dab_ring_create(capacity)
        if not self._h:
            raise MemoryError("ring allocation failed")

    def write(self, data: bytes) -> int:
        return self._lib.dab_ring_write(self._h, data, len(data))

    def read(self, n: int) -> bytes:
        buf = ctypes.create_string_buffer(n)
        got = self._lib.dab_ring_read(self._h, buf, n)
        return buf.raw[:got]

    def read_complex64(self, n_samples: int) -> np.ndarray:
        raw = self.read(n_samples * 8)
        return np.frombuffer(raw, dtype=np.complex64)

    @property
    def fill(self) -> int:
        return self._lib.dab_ring_fill(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.dab_ring_close(self._h)

    def __del__(self):
        try:
            if self._h:
                self._lib.dab_ring_close(self._h)
                self._lib.dab_ring_destroy(self._h)
                self._h = None
        except Exception:
            pass


class IQReader:
    """Background native reader: file/stdin -> complex64 ring."""

    def __init__(self, path: str, fmt: str = "f32",
                 ring_capacity: int = 1 << 24):
        self._lib = get_lib()
        self.ring = RingBuffer(ring_capacity)
        self._h = self._lib.dab_iq_reader_start(
            path.encode(), IQ_FORMATS[fmt], self.ring._h)
        if not self._h:
            self.ring.close()
            raise FileNotFoundError(path)

    @property
    def done(self) -> bool:
        return bool(self._lib.dab_iq_reader_done(self._h))

    def join(self) -> None:
        if self._h:
            self._lib.dab_iq_reader_join(self._h)
            self._h = None
