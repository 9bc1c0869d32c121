"""Pluggable audio codec backends over the native shim (libavcodec).

Reference parity: faad2 (HE-AAC for DAB+) and mpg123 (MP2 for classic DAB)
usage (/root/reference/CMakeLists.txt:50-51). Here both go through the
system libavcodec via tpudab/host/native/codec_shim.c. DAB+ AAC uses
960-sample frames (frameLengthFlag=1); if the available decoder rejects
that profile, decoding degrades gracefully to access-unit passthrough
(probe with aac_decode_available()).
"""

from __future__ import annotations

import ctypes
import functools
from typing import Optional

import numpy as np

from tpudab.audio.superframe import SuperFrameHeader

_FREQ_INDEX = {96000: 0, 88200: 1, 64000: 2, 48000: 3, 44100: 4, 32000: 5,
               24000: 6, 22050: 7, 16000: 8, 12000: 9, 11025: 10, 8000: 11}


def audio_specific_config(core_rate: int, channels: int,
                          frame_960: bool = True) -> bytes:
    """MPEG-4 AudioSpecificConfig for AAC-LC (DAB+ core)."""
    aot = 2
    fi = _FREQ_INDEX[core_rate]
    bits = (aot << 11) | (fi << 7) | (channels << 3) \
        | ((1 if frame_960 else 0) << 2)
    return bytes([(bits >> 8) & 0xFF, bits & 0xFF])


def asc_for_header(header: SuperFrameHeader) -> bytes:
    ch = 2 if header.aac_channel_mode else 1
    return audio_specific_config(header.core_sampling_rate, ch)


class _ShimDecoder:
    def __init__(self, codec_name: str, extradata: bytes = b""):
        from tpudab.host.native_lib import get_lib
        self._lib = get_lib()
        self._h = self._lib.dab_decoder_open(codec_name.encode(),
                                             extradata, len(extradata))
        if not self._h:
            raise RuntimeError(f"codec {codec_name} unavailable")
        self.sample_rate = 0
        self.channels = 0

    def decode(self, packet: bytes, max_samples: int = 1 << 20) -> np.ndarray:
        out = np.empty(max_samples, dtype=np.int16)
        sr = ctypes.c_int(0)
        ch = ctypes.c_int(0)
        n = self._lib.dab_decoder_decode(
            self._h, packet, len(packet),
            out.ctypes.data_as(ctypes.c_void_p), max_samples,
            ctypes.byref(sr), ctypes.byref(ch))
        if n < 0:
            raise ValueError(f"decode error {n}")
        if sr.value:
            self.sample_rate = sr.value
            self.channels = ch.value
        if self.channels:
            return out[:n].reshape(-1, self.channels)
        return out[:0].reshape(0, 2)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.dab_decoder_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AACDecoder(_ShimDecoder):
    """DAB+ access units -> PCM (s16, (n, channels))."""

    def __init__(self, header: SuperFrameHeader):
        super().__init__("aac", asc_for_header(header))
        self.header = header


class MP2Decoder(_ShimDecoder):
    """MP2 frames -> PCM."""

    def __init__(self):
        super().__init__("mp2")


class _ShimEncoder:
    def __init__(self, codec_name: str, sample_rate: int, channels: int,
                 bit_rate: int):
        from tpudab.host.native_lib import get_lib
        self._lib = get_lib()
        self._h = self._lib.dab_encoder_open(codec_name.encode(), sample_rate,
                                             channels, bit_rate)
        if not self._h:
            raise RuntimeError(f"encoder {codec_name} unavailable")
        self.channels = channels
        self.frame_size = self._lib.dab_encoder_frame_size(self._h)

    def encode(self, pcm: np.ndarray) -> bytes:
        """pcm: (frame_size, channels) int16 -> encoded packet bytes."""
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        assert pcm.shape[0] == self.frame_size
        cap = 1 << 16
        out = np.empty(cap, dtype=np.uint8)
        n = self._lib.dab_encoder_encode(
            self._h, pcm.ctypes.data_as(ctypes.c_void_p), pcm.shape[0],
            out.ctypes.data_as(ctypes.c_void_p), cap)
        if n < 0:
            raise ValueError(f"encode error {n}")
        return out[:n].tobytes()

    def flush(self) -> bytes:
        cap = 1 << 16
        out = np.empty(cap, dtype=np.uint8)
        n = self._lib.dab_encoder_encode(self._h, None, 0,
                                         out.ctypes.data_as(ctypes.c_void_p), cap)
        return out[:max(n, 0)].tobytes()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.dab_encoder_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class MP2Encoder(_ShimEncoder):
    """Synthesizer fixture: PCM -> MP2 frames at DAB rates (48 kHz)."""

    def __init__(self, sample_rate: int = 48000, channels: int = 2,
                 bitrate_kbps: int = 128):
        super().__init__("mp2", sample_rate, channels, bitrate_kbps * 1000)


@functools.lru_cache(maxsize=None)
def aac_decode_available() -> bool:
    """Can the system decoder handle DAB+ 960-sample AAC frames?"""
    try:
        hdr = SuperFrameHeader(dac_rate=1, sbr_flag=0, aac_channel_mode=1,
                               ps_flag=0, mpeg_surround=0)
        dec = AACDecoder(hdr)
        # decoding junk must not crash; a real probe happens on first AU
        dec.close()
        return True
    except (RuntimeError, OSError):
        return False


@functools.lru_cache(maxsize=None)
def mp2_decode_available() -> bool:
    try:
        MP2Decoder().close()
        return True
    except (RuntimeError, OSError):
        return False
