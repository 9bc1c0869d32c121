"""MSC data groups (EN 300 401 sec 5.3.3) and MOT object transfer
(EN 301 234, header mode) — parser + synthesizer builders."""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpudab.fec.crc import crc16_ccitt


class ContentType(enum.IntEnum):
    GENERAL = 0
    TEXT = 1
    IMAGE = 2
    AUDIO = 3
    VIDEO = 4
    MOT_TRANSPORT = 5


# image subtypes (TS 101 756 table 17)
IMAGE_GIF, IMAGE_JFIF, IMAGE_BMP, IMAGE_PNG = 0, 1, 2, 3

DG_TYPE_MOT_HEADER = 3
DG_TYPE_MOT_BODY = 4
DG_TYPE_MOT_DIRECTORY = 6

# MOT parameter ids (header extension)
PARAM_EXPIRE_TIME = 0x04
PARAM_TRIGGER_TIME = 0x05
PARAM_CONTENT_NAME = 0x0C
PARAM_CATEGORY_SLIDE_ID = 0x25
PARAM_CATEGORY_TITLE = 0x26
PARAM_CLICK_THROUGH_URL = 0x27
PARAM_ALT_LOCATION_URL = 0x28


@dataclasses.dataclass
class MSCDataGroup:
    dg_type: int
    continuity: int
    repetition: int
    last_segment: bool
    segment_number: int
    transport_id: Optional[int]
    data: bytes
    crc_ok: bool


def parse_msc_data_group(raw: bytes) -> Optional[MSCDataGroup]:
    if len(raw) < 2:
        return None
    b0, b1 = raw[0], raw[1]
    ext_flag = (b0 >> 7) & 1
    crc_flag = (b0 >> 6) & 1
    seg_flag = (b0 >> 5) & 1
    ua_flag = (b0 >> 4) & 1
    dg_type = b0 & 0x0F
    continuity = (b1 >> 4) & 0x0F
    repetition = b1 & 0x0F
    pos = 2 + (2 if ext_flag else 0)
    crc_ok = True
    if crc_flag:
        if len(raw) < pos + 2:
            return None
        calc = crc16_ccitt(np.frombuffer(raw[:-2], dtype=np.uint8))
        sent = (raw[-2] << 8) | raw[-1]
        crc_ok = calc == sent
        payload_end = len(raw) - 2
    else:
        payload_end = len(raw)
    last, seg_num = True, 0
    if seg_flag:
        if payload_end < pos + 2:
            return None
        last = bool(raw[pos] >> 7)
        seg_num = ((raw[pos] & 0x7F) << 8) | raw[pos + 1]
        pos += 2
    transport_id = None
    if ua_flag:
        if payload_end < pos + 1:
            return None
        li = raw[pos] & 0x0F
        tid_flag = (raw[pos] >> 4) & 1
        pos += 1
        if tid_flag and payload_end >= pos + 2:
            transport_id = (raw[pos] << 8) | raw[pos + 1]
        pos += li
    return MSCDataGroup(dg_type, continuity, repetition, last, seg_num,
                        transport_id, raw[pos:payload_end], crc_ok)


def build_msc_data_group(dg_type: int, continuity: int, segment_number: int,
                         last: bool, transport_id: int, data: bytes) -> bytes:
    b0 = (0 << 7) | (1 << 6) | (1 << 5) | (1 << 4) | (dg_type & 0x0F)
    b1 = ((continuity & 0x0F) << 4)
    seg = bytes([((1 if last else 0) << 7) | ((segment_number >> 8) & 0x7F),
                 segment_number & 0xFF])
    ua = bytes([(1 << 4) | 2, (transport_id >> 8) & 0xFF, transport_id & 0xFF])
    body = bytes([b0, b1]) + seg + ua + data
    crc = int(crc16_ccitt(np.frombuffer(body, dtype=np.uint8)))
    return body + bytes([crc >> 8, crc & 0xFF])


# ---------------------------------------------------------------------------
# MOT header-mode objects
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MOTObject:
    transport_id: int
    content_type: int
    content_subtype: int
    body: bytes
    content_name: str = ""
    params: Dict[int, bytes] = dataclasses.field(default_factory=dict)

    @property
    def is_image(self) -> bool:
        return self.content_type == ContentType.IMAGE


def _encode_header(body_size: int, content_type: int, content_subtype: int,
                   params: Dict[int, bytes]) -> bytes:
    ext = b""
    for pid, val in params.items():
        if len(val) == 0:
            ext += bytes([(0 << 6) | pid])
        elif len(val) == 1:
            ext += bytes([(1 << 6) | pid]) + val
        elif len(val) == 4:
            ext += bytes([(2 << 6) | pid]) + val
        else:
            assert len(val) < 128
            ext += bytes([(3 << 6) | pid, len(val)]) + val
    header_size = 7 + len(ext)
    h = bytearray(7)
    h[0] = (body_size >> 20) & 0xFF
    h[1] = (body_size >> 12) & 0xFF
    h[2] = (body_size >> 4) & 0xFF
    h[3] = ((body_size & 0x0F) << 4) | ((header_size >> 9) & 0x0F)
    h[4] = (header_size >> 1) & 0xFF
    h[5] = ((header_size & 1) << 7) | ((content_type & 0x3F) << 1) \
        | ((content_subtype >> 8) & 1)
    h[6] = content_subtype & 0xFF
    return bytes(h) + ext


def _decode_header(data: bytes):
    if len(data) < 7:
        return None
    body_size = (data[0] << 20) | (data[1] << 12) | (data[2] << 4) | (data[3] >> 4)
    header_size = ((data[3] & 0x0F) << 9) | (data[4] << 1) | (data[5] >> 7)
    content_type = (data[5] >> 1) & 0x3F
    content_subtype = ((data[5] & 1) << 8) | data[6]
    params: Dict[int, bytes] = {}
    pos = 7
    while pos < min(header_size, len(data)):
        b = data[pos]
        pli = (b >> 6) & 3
        pid = b & 0x3F
        pos += 1
        if pli == 0:
            params[pid] = b""
        elif pli == 1:
            params[pid] = data[pos : pos + 1]
            pos += 1
        elif pli == 2:
            params[pid] = data[pos : pos + 4]
            pos += 4
        else:
            if pos >= len(data):
                break
            ext_flag = data[pos] >> 7
            if ext_flag:
                length = ((data[pos] & 0x7F) << 8) | data[pos + 1]
                pos += 2
            else:
                length = data[pos] & 0x7F
                pos += 1
            params[pid] = data[pos : pos + length]
            pos += length
    return body_size, header_size, content_type, content_subtype, params


class MOTAssembler:
    """Assembles MOT objects from MSC data groups (header mode)."""

    def __init__(self, on_object=None):
        self.on_object = on_object
        self._headers: Dict[int, tuple] = {}
        self._header_segs: Dict[int, Dict[int, bytes]] = {}
        self._header_last: Dict[int, int] = {}
        self._bodies: Dict[int, Dict[int, bytes]] = {}
        self._body_last: Dict[int, int] = {}
        self.objects: Dict[int, MOTObject] = {}
        self.stats = {"groups": 0, "crc_errors": 0, "objects": 0}

    def push_data_group(self, raw: bytes) -> None:
        dg = parse_msc_data_group(raw)
        if dg is None:
            return
        self.stats["groups"] += 1
        if not dg.crc_ok:
            self.stats["crc_errors"] += 1
            return
        tid = dg.transport_id
        if tid is None:
            return
        if dg.dg_type == DG_TYPE_MOT_HEADER:
            segs = self._header_segs.setdefault(tid, {})
            segs[dg.segment_number] = dg.data
            if dg.last_segment:
                self._header_last[tid] = dg.segment_number
            self._try_header(tid)
        elif dg.dg_type == DG_TYPE_MOT_BODY:
            segs = self._bodies.setdefault(tid, {})
            segs[dg.segment_number] = dg.data
            if dg.last_segment:
                self._body_last[tid] = dg.segment_number
            self._try_complete(tid)

    def _try_header(self, tid: int) -> None:
        last = self._header_last.get(tid)
        segs = self._header_segs.get(tid, {})
        if last is None or not all(i in segs for i in range(last + 1)):
            return
        raw = b"".join(segs[i] for i in range(last + 1))
        hdr = _decode_header(raw)
        if hdr is not None:
            self._headers[tid] = hdr
            self._try_complete(tid)

    def _try_complete(self, tid: int) -> None:
        hdr = self._headers.get(tid)
        last = self._body_last.get(tid)
        segs = self._bodies.get(tid, {})
        if hdr is None or last is None or not all(i in segs for i in range(last + 1)):
            return
        body = b"".join(segs[i] for i in range(last + 1))
        body_size, _, ctype, csub, params = hdr
        if len(body) < body_size:
            return
        name = params.get(PARAM_CONTENT_NAME, b"")
        content_name = name[1:].decode("latin-1", "replace") if name else ""
        obj = MOTObject(transport_id=tid, content_type=ctype,
                        content_subtype=csub, body=body[:body_size],
                        content_name=content_name, params=params)
        self.objects[tid] = obj
        self.stats["objects"] += 1
        # clear assembly state
        self._bodies.pop(tid, None)
        self._body_last.pop(tid, None)
        if self.on_object:
            self.on_object(obj)


def build_mot_object_groups(obj: MOTObject, segment_size: int = 128) -> List[bytes]:
    """Synthesizer: MOT object -> list of MSC data groups (header + body)."""
    params = dict(obj.params)
    if obj.content_name and PARAM_CONTENT_NAME not in params:
        params[PARAM_CONTENT_NAME] = bytes([0]) + obj.content_name.encode("latin-1")
    header = _encode_header(len(obj.body), obj.content_type,
                            obj.content_subtype, params)
    groups = []
    cont = 0
    hsegs = [header[i : i + segment_size] for i in range(0, len(header), segment_size)]
    for i, seg in enumerate(hsegs):
        groups.append(build_msc_data_group(DG_TYPE_MOT_HEADER, cont & 0xF, i,
                                           i == len(hsegs) - 1,
                                           obj.transport_id, seg))
        cont += 1
    bsegs = [obj.body[i : i + segment_size] for i in range(0, len(obj.body), segment_size)]
    for i, seg in enumerate(bsegs):
        groups.append(build_msc_data_group(DG_TYPE_MOT_BODY, cont & 0xF, i,
                                           i == len(bsegs) - 1,
                                           obj.transport_id, seg))
        cont += 1
    return groups
