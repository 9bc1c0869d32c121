"""DAB+ audio superframe processing, ETSI TS 102 563.

Reference parity: `aac_frame_processor` (SURVEY.md sec 2.3): 5 logical frames
-> superframe; Firecode CRC-16 header check; RS(120,110) outer decode;
AAC access-unit extraction with per-AU CRC; SuperFrameHeader{sampling_rate,
is_stereo, is_parametric_stereo, is_spectral_band_replication, mpeg_surround}
and error flags IsFirecodeError/IsRSError/IsAUError.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from tpudab.fec.crc import firecode_check, firecode_compute, crc16_ccitt, crc16_append
from tpudab.fec import rs

FRAMES_PER_SUPERFRAME = 5


@dataclasses.dataclass
class SuperFrameHeader:
    dac_rate: int                  # 0 = 32 kHz DAC, 1 = 48 kHz DAC
    sbr_flag: int
    aac_channel_mode: int          # 0 = mono, 1 = stereo
    ps_flag: int
    mpeg_surround: int

    @property
    def sampling_rate(self) -> int:
        """Output sampling rate of the decoded audio."""
        return 48_000 if self.dac_rate else 32_000

    @property
    def core_sampling_rate(self) -> int:
        """AAC core rate (half the DAC rate when SBR is used)."""
        return self.sampling_rate // (2 if self.sbr_flag else 1)

    @property
    def is_stereo(self) -> bool:
        return bool(self.aac_channel_mode or self.ps_flag)

    @property
    def num_aus(self) -> int:
        return {(0, 0): 4, (1, 0): 6, (0, 1): 2, (1, 1): 3}[
            (self.dac_rate, self.sbr_flag)]


def header_size_bytes(num_aus: int) -> int:
    """TS 102 563 sec 5.2: firecode (16) + rfa/dac_rate/sbr_flag/
    aac_channel_mode/ps_flag/mpeg_surround_config (8) + au_start (12 each,
    num_aus-1 of them) + alignment to a byte boundary.

    -> 8/5/11/6 bytes for 4/2/6/3 AUs, i.e. the first AU starts at byte
    8/5/11/6 (the offsets every fielded DAB+ decoder hardcodes). Pinned by
    the hand-assembled standard fixture in tests/test_standard_fixtures.py.
    """
    bits = 24 + 12 * (num_aus - 1)
    return (bits + 7) // 8


@dataclasses.dataclass
class SuperFrameResult:
    header: Optional[SuperFrameHeader]
    access_units: List[bytes]
    au_crc_ok: List[bool]
    firecode_ok: bool
    rs_ok: bool
    rs_corrected: int


def parse_superframe(data: np.ndarray, subch_bitrate_kbps: int,
                     apply_rs: bool = True) -> SuperFrameResult:
    """Parse one superframe (120*L bytes, L = bitrate/8) after MSC decode."""
    data = np.asarray(data, dtype=np.uint8)
    l_cw = subch_bitrate_kbps // 8
    assert data.shape[0] == 120 * l_cw, (data.shape, l_cw)

    rs_ok, n_corr = True, 0
    if apply_rs:
        cw = data.reshape(120, l_cw).T  # codeword i = bytes i, i+L, ...
        corrected, nerr, failed = rs.rs_decode(cw)
        rs_ok = not failed.any()
        n_corr = int(np.maximum(nerr, 0).sum())
        data = corrected.T.reshape(-1)
    audio = data[: 110 * l_cw]

    fc_ok = bool(firecode_check(audio[None, :16])[0]) if audio.shape[0] >= 16 else False
    if not fc_ok:
        return SuperFrameResult(None, [], [], False, rs_ok, n_corr)

    b2 = int(audio[2])
    header = SuperFrameHeader(
        dac_rate=(b2 >> 6) & 1,
        sbr_flag=(b2 >> 5) & 1,
        aac_channel_mode=(b2 >> 4) & 1,
        ps_flag=(b2 >> 3) & 1,
        mpeg_surround=b2 & 7,
    )
    n_aus = header.num_aus
    hdr_bytes = header_size_bytes(n_aus)
    starts = [hdr_bytes]
    bitpos = 24
    for _ in range(n_aus - 1):
        byte_i, bit_i = 3 + (bitpos - 24) // 8, (bitpos - 24) % 8
        window = (int(audio[byte_i]) << 16) | (int(audio[byte_i + 1]) << 8) | \
                 (int(audio[byte_i + 2]) if byte_i + 2 < audio.shape[0] else 0)
        val = (window >> (12 - bit_i)) & 0xFFF
        starts.append(val)
        bitpos += 12
    starts.append(audio.shape[0])

    aus, oks = [], []
    for i in range(n_aus):
        lo, hi = starts[i], starts[i + 1]
        if not (hdr_bytes <= lo < hi <= audio.shape[0]):
            aus.append(b"")
            oks.append(False)
            continue
        au = audio[lo:hi]
        ok = bool(au.shape[0] > 2 and
                  crc16_ccitt(au[:-2]) == ((int(au[-2]) << 8) | int(au[-1])))
        aus.append(au[:-2].tobytes() if ok else au.tobytes())
        oks.append(ok)
    return SuperFrameResult(header, aus, oks, True, rs_ok, n_corr)


def build_superframe(header: SuperFrameHeader, au_payloads: List[bytes],
                     subch_bitrate_kbps: int) -> np.ndarray:
    """Synthesizer: AUs (without CRC) -> 120*L superframe bytes with RS parity."""
    l_cw = subch_bitrate_kbps // 8
    n_aus = header.num_aus
    assert len(au_payloads) == n_aus
    hdr_bytes = header_size_bytes(n_aus)
    audio_len = 110 * l_cw

    total = hdr_bytes + sum(len(p) + 2 for p in au_payloads)
    assert total <= audio_len, f"AUs too large: {total} > {audio_len}"

    audio = np.zeros(audio_len, dtype=np.uint8)
    b2 = ((header.dac_rate & 1) << 6) | ((header.sbr_flag & 1) << 5) \
        | ((header.aac_channel_mode & 1) << 4) | ((header.ps_flag & 1) << 3) \
        | (header.mpeg_surround & 7)
    audio[2] = b2

    # AU start fields (12-bit, MSB first, starting at byte 3)
    starts = []
    pos = hdr_bytes
    for p in au_payloads:
        starts.append(pos)
        pos += len(p) + 2
    bitpos = 0
    for s in starts[1:]:
        byte_i, bit_i = 3 + bitpos // 8, bitpos % 8
        if bit_i == 0:
            audio[byte_i] = (s >> 4) & 0xFF
            audio[byte_i + 1] |= (s & 0xF) << 4
        else:  # bit_i == 4
            audio[byte_i] |= (s >> 8) & 0xF
            audio[byte_i + 1] = s & 0xFF
        bitpos += 12

    for s, p in zip(starts, au_payloads):
        au = crc16_append(np.frombuffer(p, dtype=np.uint8))
        audio[s : s + au.shape[0]] = au

    fc = int(firecode_compute(audio[2:11]))
    audio[0], audio[1] = fc >> 8, fc & 0xFF

    cw = rs.rs_encode(audio.reshape(110, l_cw).T.astype(np.uint8))  # (L, 120)
    return cw.T.reshape(-1)


class DABPlusChannel:
    """Streaming DAB+ channel: logical frames -> AUs, with superframe phase
    sync via firecode (reference analog: Basic_DAB_Plus_Channel state flags).
    """

    def __init__(self, subch_bitrate_kbps: int):
        from tpudab.pad.xpad import XPADProcessor
        from tpudab.mot.slideshow import SlideshowManager

        self.bitrate = subch_bitrate_kbps
        self.frame_bytes = subch_bitrate_kbps * 3
        self._buf: List[np.ndarray] = []
        self._locked_phase: Optional[int] = None
        self.stats = {"firecode_errors": 0, "rs_errors": 0, "au_errors": 0,
                      "superframes": 0, "rs_corrected": 0}
        self.last_header: Optional[SuperFrameHeader] = None
        # PAD chain (reference: GetDynamicLabel / GetSlideshowManager)
        self.slideshow = SlideshowManager()
        self.xpad = XPADProcessor(on_mot_data_group=self.slideshow.push_data_group)

    @property
    def dynamic_label(self) -> str:
        return self.xpad.dynamic_label.label

    def _try_lock(self) -> None:
        """Find the superframe phase: firecode must verify on the RS-corrected
        candidate; slide one logical frame at a time."""
        while len(self._buf) >= FRAMES_PER_SUPERFRAME:
            cand = np.concatenate(self._buf[:FRAMES_PER_SUPERFRAME])
            res = parse_superframe(cand, self.bitrate)
            if res.firecode_ok:
                self._locked_phase = 0
                return
            self._buf.pop(0)

    def process_frames(self, frames: np.ndarray):
        """frames: (N, frame_bytes) uint8 -> list of SuperFrameResult."""
        results = []
        for f in np.asarray(frames, dtype=np.uint8).reshape(-1, self.frame_bytes):
            self._buf.append(f)
        if self._locked_phase is None:
            self._try_lock()
        while self._locked_phase is not None and len(self._buf) >= FRAMES_PER_SUPERFRAME:
            sf = np.concatenate(self._buf[:FRAMES_PER_SUPERFRAME])
            del self._buf[:FRAMES_PER_SUPERFRAME]
            res = parse_superframe(sf, self.bitrate)
            self.stats["superframes"] += 1
            self.stats["rs_corrected"] += res.rs_corrected
            if not res.firecode_ok:
                self.stats["firecode_errors"] += 1
                self._locked_phase = None  # resync
                self._try_lock()
                continue
            if not res.rs_ok:
                self.stats["rs_errors"] += 1
            self.stats["au_errors"] += sum(1 for ok in res.au_crc_ok if not ok)
            self.last_header = res.header
            # PAD: each AU may start with a PAD DSE (TS 102 563 sec 5.4.3)
            from tpudab.pad.xpad import extract_pad_from_dabplus_au
            for au, ok in zip(res.access_units, res.au_crc_ok):
                if not ok:
                    continue
                _, fpad, xpad = extract_pad_from_dabplus_au(bytes(au))
                if fpad:
                    self.xpad.push(fpad, xpad)
            results.append(res)
        return results
