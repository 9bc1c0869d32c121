"""Ensemble synthesizer: services/subchannels -> FIC FIGs + coded MSC -> frame bits.

Inverse of the tpudab.fic parser and tpudab.msc decode pipeline; built from
EN 300 401 sec 5-8 (FIB/FIG syntax) and sec 11-12 (channel coding). Test
fixture generating standard-shaped multiplexes with no recorded capture.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpudab.constants.dab_params import get_dab_params, CIF_CU, CU_BITS, FIB_BYTES
from tpudab.constants.puncture import (
    FIC_PROFILE, FIC_PROFILE_MODE3, eep_profile, get_uep_profile,
    get_uep_index_table, PunctureProfile,
)
from tpudab.fec.conv import conv_encode
from tpudab.fec.depuncture import puncture
from tpudab.fec.prbs import descramble_bits
from tpudab.fec.crc import crc16_append
from tpudab.msc.interleave import interleave_np, TIME_INTERLEAVE_DEPTH
from tpudab.synth.modulator import modulate_frame_bits
from tpudab.utils.bits import unpack_bits, pack_bits

ASCTY_DAB = 0       # MPEG-1/2 layer II audio
ASCTY_DAB_PLUS = 63  # AAC superframes
TMID_STREAM_AUDIO = 0
TMID_STREAM_DATA = 1
TMID_PACKET_DATA = 3


@dataclasses.dataclass
class SubchannelSpec:
    subch_id: int
    start_cu: int
    size_cu: int
    protection: tuple  # ('eep', level 1..4, option 0|1) or ('uep', bitrate, level)

    def profile(self) -> PunctureProfile:
        kind = self.protection[0]
        if kind == "eep":
            return eep_profile(self.size_cu, self.protection[1], self.protection[2])
        if kind == "uep":
            return get_uep_profile(self.protection[1], self.protection[2]).to_profile()
        raise ValueError(self.protection)

    @property
    def bitrate_kbps(self) -> int:
        kind = self.protection[0]
        if kind == "eep":
            from tpudab.constants.puncture import eep_bitrate_kbps
            return eep_bitrate_kbps(self.size_cu, self.protection[1], self.protection[2])
        return self.protection[1]

    @property
    def data_bits_per_frame(self) -> int:
        """Convolutional input bits per 24 ms logical frame."""
        return self.bitrate_kbps * 24

    @property
    def uep_padding_bits(self) -> int:
        if self.protection[0] == "uep":
            return get_uep_profile(self.protection[1], self.protection[2]).padding_bits
        return 0


@dataclasses.dataclass
class ServiceSpec:
    service_id: int
    label: str
    components: list  # [(tmid, ascty_or_dscty, subch_id)]
    programme_type: int = 0
    language: int = 0x09
    country_id: int = 0xC  # UK by default (with ECC 0xE1)


@dataclasses.dataclass
class FMLinkSpec:
    """Linked FM service (RDS PI + frequency list) for FIG 0/6 + 0/21."""

    service_id: int         # DAB service the FM service is linked to
    rds_pi: int
    frequencies_hz: list    # FM frequencies
    link_session: int = 1


@dataclasses.dataclass
class DRMLinkSpec:
    service_id: int
    drm_id: int
    frequencies_hz: list
    link_session: int = 2


@dataclasses.dataclass
class EnsembleSpec:
    ensemble_id: int
    label: str
    services: list
    subchannels: list
    ecc: int = 0xE1
    lto_half_hours: int = 0
    inter_table_id: int = 1
    fm_links: list = dataclasses.field(default_factory=list)
    drm_links: list = dataclasses.field(default_factory=list)


def _label16(s: str) -> bytes:
    b = s.encode("latin-1", "replace")[:16]
    return b + b" " * (16 - len(b))


class _FIGWriter:
    """Accumulates FIGs and packs them into CRC'd FIBs."""

    def __init__(self):
        self.figs = []

    def add(self, fig_type: int, payload: bytes):
        assert 1 <= len(payload) <= 29
        self.figs.append(bytes([(fig_type << 5) | len(payload)]) + payload)

    def add_list(self, fig_type: int, header: bytes, items: list):
        """Add a list-structured FIG (e.g. FIG 0/1 subchannel org, 0/2
        service org), SEGMENTING across multiple FIGs when the entries
        exceed the 29-byte FIG payload limit — as real multiplexes do
        (EN 300 401 sec 5.2: a FIG carries as many complete entries as
        fit; receivers accumulate across FIGs)."""
        body = bytearray(header)
        for it in items:
            assert len(header) + len(it) <= 29, "single entry exceeds a FIG"
            if len(body) + len(it) > 29:
                self.add(fig_type, bytes(body))
                body = bytearray(header)
            body += it
        if len(body) > len(header):
            self.add(fig_type, bytes(body))

    def pack_fibs(self, n_fibs: int) -> np.ndarray:
        """Greedy first-fit packing into n_fibs FIBs of 30 data bytes."""
        fibs = []
        queue = list(self.figs)
        for _ in range(n_fibs):
            body = b""
            while queue and len(body) + len(queue[0]) <= 30:
                body += queue.pop(0)
            if len(body) < 30:
                body += b"\xff"  # end marker
            body += b"\x00" * (30 - len(body))
            fibs.append(crc16_append(np.frombuffer(body, dtype=np.uint8)))
        assert not queue, f"{len(queue)} FIGs did not fit in {n_fibs} FIBs"
        return np.stack(fibs)


class EnsembleSynthesizer:
    """Builds transmission-frame bits (and IQ) for a described ensemble.

    Payload bytes per subchannel logical frame come from a per-subchannel
    callback or default to a seeded PRNG stream.
    """

    def __init__(self, spec: EnsembleSpec, mode: int = 1, seed: int = 1234):
        self.spec = spec
        self.mode = mode
        self.dab = get_dab_params(mode)
        self.rng = np.random.default_rng(seed)
        self.payload_fn = {}   # subch_id -> fn(logical_frame_idx) -> bytes
        self._payload_cache = {}
        used = np.zeros(CIF_CU, dtype=bool)
        for sub in spec.subchannels:
            if sub.protection[0] == "uep":
                expect = get_uep_profile(sub.protection[1], sub.protection[2]).size_cu
                assert sub.size_cu == expect, (
                    f"subchannel {sub.subch_id}: UEP {sub.protection[1]}kbps "
                    f"PL{sub.protection[2]} requires size {expect} CU, got {sub.size_cu}")
            seg = used[sub.start_cu : sub.start_cu + sub.size_cu]
            assert not seg.any(), f"subchannel {sub.subch_id} overlaps"
            seg[:] = True
        self.cif_counter = 0

    # ---------------- FIC ----------------

    def _build_figs(self, frame_idx: int) -> _FIGWriter:
        w = _FIGWriter()
        spec = self.spec
        cif = (self.cif_counter) % 5000
        # FIG 0/0 ensemble info: EId(16) Change(2) Al(1) CIFcnt(13)
        hi = (cif // 250) % 20
        lo = cif % 250
        w.add(0, bytes([0x00,
                        spec.ensemble_id >> 8, spec.ensemble_id & 0xFF,
                        (0 << 6) | (0 << 5) | hi, lo]))
        # FIG 0/1 subchannel organization (long form EEP / short form UEP),
        # segmented across FIGs when the ensemble has many subchannels
        uep_index = get_uep_index_table()
        items = []
        for sub in spec.subchannels:
            it = bytes([(sub.subch_id << 2) | (sub.start_cu >> 8),
                        sub.start_cu & 0xFF])
            kind = sub.protection[0]
            if kind == "eep":
                level, option = sub.protection[1], sub.protection[2]
                b0 = 0x80 | (option << 4) | ((level - 1) << 2) | (sub.size_cu >> 8)
                it += bytes([b0, sub.size_cu & 0xFF])
            else:
                idx = uep_index[(sub.protection[1], sub.protection[2])]
                it += bytes([idx & 0x3F])
            items.append(it)
        w.add_list(0, bytes([0x01]), items)
        # FIG 0/2 service organization (segmented per complete service)
        items = []
        packet_comps = []
        for svc in spec.services:
            it = bytes([svc.service_id >> 8, svc.service_id & 0xFF,
                        len(svc.components) & 0x0F])
            for (tmid, ty, subch_id) in svc.components:
                ps, ca = 1, 0  # primary component, no conditional access
                if tmid == TMID_PACKET_DATA:
                    # SCId == subch_id by synth convention; FIG 0/3 links it
                    scid = subch_id
                    it += bytes([(tmid << 6) | ((scid >> 6) & 0x3F),
                                 ((scid & 0x3F) << 2) | (ps << 1) | ca])
                    packet_comps.append((scid, ty, subch_id))
                else:
                    it += bytes([(tmid << 6) | (ty & 0x3F),
                                 (subch_id << 2) | (ps << 1) | ca])
            items.append(it)
        w.add_list(0, bytes([0x02]), items)
        # FIG 0/3 packet-mode component info: SCId -> subchannel + DSCTy
        if packet_comps:
            items = []
            for (scid, dscty, subch_id) in packet_comps:
                dg_flag = 0
                items.append(bytes([(scid >> 4) & 0xFF, ((scid & 0x0F) << 4),
                                    (dg_flag << 7) | (dscty & 0x3F),
                                    (subch_id << 2), 0x02]))  # packet addr 2
            w.add_list(0, bytes([0x03]), items)
        # FIG 0/9 country/LTO/ECC + international table
        w.add(0, bytes([0x09, (0 << 7) | (abs(spec.lto_half_hours) & 0x3F),
                        spec.ecc, spec.inter_table_id]))
        # FIG 0/17 programme type per service
        for svc in spec.services:
            w.add(0, bytes([0x11, svc.service_id >> 8, svc.service_id & 0xFF,
                            0b00000000, svc.programme_type & 0x1F]))
        # FIG 0/6 service linkage + FIG 0/21 frequency info (FM/DRM links)
        for link in spec.fm_links:
            lsn = link.link_session
            b0 = (1 << 7) | (1 << 6) | (0 << 5) | (0 << 4) | ((lsn >> 8) & 0x0F)
            body = bytes([0x06, b0, lsn & 0xFF,
                          (1 << 5) | 1,  # IdLQ=1 (RDS PI), 1 id
                          link.rds_pi >> 8, link.rds_pi & 0xFF])
            w.add(0, body)
            fi = bytearray()
            n_freq = len(link.frequencies_hz)
            fi += bytes([link.rds_pi >> 8, link.rds_pi & 0xFF,
                         (8 << 4) | n_freq])  # R&M=8 (FM w/ RDS)
            for f_hz in link.frequencies_hz:
                fi.append(round((f_hz - 87_500_000) / 100_000))
            body = bytes([0x15, 0x00, len(fi) & 0x1F]) + bytes(fi)
            w.add(0, body)
        for link in spec.drm_links:
            lsn = link.link_session
            b0 = (1 << 7) | (1 << 6) | (0 << 5) | (0 << 4) | ((lsn >> 8) & 0x0F)
            body = bytes([0x06, b0, lsn & 0xFF,
                          (2 << 5) | 1,  # IdLQ=2 (DRM), 1 id
                          link.drm_id >> 8, link.drm_id & 0xFF])
            w.add(0, body)
            fi = bytearray()
            nb = 1 + 2 * len(link.frequencies_hz)
            fi += bytes([link.drm_id >> 8, link.drm_id & 0xFF, (6 << 4) | nb,
                         link.drm_id & 0xFF])
            for f_hz in link.frequencies_hz:
                khz = f_hz // 1000
                fi += bytes([(khz >> 8) & 0x7F, khz & 0xFF])
            body = bytes([0x15, 0x00, len(fi) & 0x1F]) + bytes(fi)
            w.add(0, body)
        # FIG 1/0 ensemble label
        w.add(1, bytes([0x00, spec.ensemble_id >> 8, spec.ensemble_id & 0xFF])
              + _label16(spec.label) + b"\x00\x00")
        # FIG 1/1 programme service labels
        for svc in spec.services:
            w.add(1, bytes([0x01, svc.service_id >> 8, svc.service_id & 0xFF])
              + _label16(svc.label) + b"\x00\x00")
        return w

    def build_fic_bits(self, frame_idx: int) -> np.ndarray:
        """Punctured FIC soft-bit-source (0/1) for one transmission frame."""
        w = self._build_figs(frame_idx)
        fibs = w.pack_fibs(self.dab.nb_fibs)  # (n_fibs, 32) bytes
        groups = fibs.reshape(self.dab.nb_fib_groups,
                              self.dab.nb_fibs_per_group * FIB_BYTES)
        profile = FIC_PROFILE_MODE3 if self.mode == 3 else FIC_PROFILE
        out = []
        for g in groups:
            bits = unpack_bits(g)
            scrambled = descramble_bits(bits)
            coded = conv_encode(scrambled)
            out.append(puncture(coded, profile))
        return np.concatenate(out)

    # ---------------- MSC ----------------

    def payload_for(self, sub: SubchannelSpec, logical_idx: int) -> bytes:
        key = (sub.subch_id, logical_idx)
        if key not in self._payload_cache:
            fn = self.payload_fn.get(sub.subch_id)
            nbytes = sub.data_bits_per_frame // 8
            if fn is None:
                data = self.rng.integers(0, 256, nbytes).astype(np.uint8).tobytes()
            else:
                data = fn(logical_idx)
                assert len(data) == nbytes, (len(data), nbytes)
            self._payload_cache[key] = data
        return self._payload_cache[key]

    def _coded_logical_frame(self, sub: SubchannelSpec, logical_idx: int) -> np.ndarray:
        """Scramble + encode + puncture one logical frame -> subchannel slice bits."""
        data = np.frombuffer(self.payload_for(sub, logical_idx), dtype=np.uint8)
        bits = descramble_bits(unpack_bits(data))
        coded = conv_encode(bits)
        punctured = puncture(coded, sub.profile())
        pad = sub.uep_padding_bits
        if pad:
            punctured = np.concatenate([punctured, np.zeros(pad, dtype=punctured.dtype)])
        assert punctured.shape[0] == sub.size_cu * CU_BITS
        return punctured

    def build_cif_bits(self, cif_idx: int) -> np.ndarray:
        """One CIF (55,296 bits) with all subchannels time-interleaved."""
        from tpudab.constants.dab_params import CIF_BITS
        cif = np.zeros(CIF_BITS, dtype=np.uint8)
        for sub in self.spec.subchannels:
            depth = TIME_INTERLEAVE_DEPTH
            lo = max(cif_idx - depth + 1, 0)
            frames = np.stack([self._coded_logical_frame(sub, m)
                               for m in range(lo, cif_idx + 1)])
            interleaved = interleave_np(
                np.concatenate([np.zeros((depth - frames.shape[0], frames.shape[1]),
                                         dtype=frames.dtype), frames]))
            slice_bits = interleaved[-1]
            start = sub.start_cu * CU_BITS
            cif[start : start + slice_bits.shape[0]] = slice_bits
        return cif

    # ---------------- frames ----------------

    def frame_bits(self, frame_idx: int) -> np.ndarray:
        """All soft-bit-source bits (FIC + MSC CIFs) for one transmission frame."""
        fic = self.build_fic_bits(frame_idx)
        cifs = [self.build_cif_bits(frame_idx * self.dab.nb_cifs + c)
                for c in range(self.dab.nb_cifs)]
        self.cif_counter += self.dab.nb_cifs
        bits = np.concatenate([fic] + cifs)
        assert bits.shape[0] == self.dab.nb_frame_bits
        return bits

    def frames_iq(self, n_frames: int) -> np.ndarray:
        """Synthesize n_frames transmission frames of clean baseband IQ."""
        self.cif_counter = 0
        frames = [modulate_frame_bits(self.frame_bits(i), self.mode)
                  for i in range(n_frames)]
        return np.concatenate(frames)
