"""MOT directory mode (EN 301 234) + reassembly hardening
(VERDICT round-1 #7): interleaved/out-of-order segments, bodies before the
directory, dropped segments, carousel pruning, LRU eviction."""

import random

import numpy as np

from tpudab.mot.mot import (MOTObject, MOTAssembler, ContentType,
                            build_mot_directory_groups,
                            encode_mot_directory, decode_mot_directory,
                            _encode_header)


def _objects(n=3, seed=1):
    rng = np.random.default_rng(seed)
    objs = []
    for i in range(n):
        body = rng.integers(0, 256, 300 + 77 * i).astype(np.uint8).tobytes()
        objs.append(MOTObject(transport_id=0x100 + i,
                              content_type=ContentType.IMAGE,
                              content_subtype=3, body=body,
                              content_name=f"slide{i}.png"))
    return objs


def test_directory_roundtrip_interleaved():
    objs = _objects()
    groups = build_mot_directory_groups(objs, segment_size=64)
    # interleave: shuffle deterministically (out-of-order + dir not first)
    rng = random.Random(42)
    shuffled = groups[:]
    rng.shuffle(shuffled)
    asm = MOTAssembler()
    for g in shuffled:
        asm.push_data_group(g)
    assert asm.stats["directories"] == 1
    assert len(asm.objects) == 3
    for obj in objs:
        got = asm.objects[obj.transport_id]
        assert got.body == obj.body
        assert got.content_name == obj.content_name
        assert got.content_subtype == 3


def test_directory_dropped_segment():
    """A dropped body segment must block only that object; a retransmission
    completes it."""
    objs = _objects(2)
    groups = build_mot_directory_groups(objs, segment_size=64)
    # find a body group of object 0x100 to drop (first body group after dir)
    from tpudab.mot.mot import parse_msc_data_group, DG_TYPE_MOT_BODY
    dropped_idx = next(i for i, g in enumerate(groups)
                       if (parse_msc_data_group(g).dg_type == DG_TYPE_MOT_BODY
                           and parse_msc_data_group(g).transport_id == 0x100))
    asm = MOTAssembler()
    for i, g in enumerate(groups):
        if i != dropped_idx:
            asm.push_data_group(g)
    assert 0x101 in asm.objects and 0x100 not in asm.objects
    asm.push_data_group(groups[dropped_idx])  # carousel retransmission
    assert 0x100 in asm.objects
    assert asm.objects[0x100].body == objs[0].body


def test_directory_carousel_pruning():
    """A new directory drops transports that left the carousel."""
    objs = _objects(2)
    asm = MOTAssembler()
    for g in build_mot_directory_groups(objs, segment_size=64):
        asm.push_data_group(g)
    assert set(asm.objects) == {0x100, 0x101}
    new_objs = _objects(1, seed=9)  # only 0x100 remains
    for g in build_mot_directory_groups(new_objs, segment_size=64):
        asm.push_data_group(g)
    assert 0x101 not in asm.objects
    assert asm.objects[0x100].body == new_objs[0].body


def test_directory_codec_roundtrip():
    hdr = _encode_header(123, 2, 3, {})
    raw = encode_mot_directory([(7, hdr), (9, hdr)], segment_size=64,
                               carousel_period_ms=10_000)
    entries = decode_mot_directory(raw)
    assert [tid for tid, _ in entries] == [7, 9]
    assert entries[0][1][0] == 123  # body_size survives


def test_pending_lru_eviction():
    """Unbounded incomplete transports are evicted LRU (hardening against
    a hostile/broken carousel)."""
    asm = MOTAssembler()
    from tpudab.mot.mot import build_msc_data_group, DG_TYPE_MOT_BODY
    for tid in range(200):
        # first-of-2 segments only: never completes
        asm.push_data_group(build_msc_data_group(
            DG_TYPE_MOT_BODY, 0, 0, False, tid, b"x" * 16))
    assert len(asm._bodies) <= asm.MAX_PENDING
    assert asm.stats["evicted"] >= 100
