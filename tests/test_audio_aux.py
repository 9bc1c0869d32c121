"""Audio codecs (native shim), audio pipeline, PAD/dynamic labels, MOT
slideshow, packet-mode data channels."""

import numpy as np
import pytest

from tpudab.audio.pipeline import AudioPipeline, Resampler, WavSink
from tpudab.pad.xpad import (XPADProcessor, build_dynamic_label_segments,
                             build_xpad_into_au, extract_pad_from_dabplus_au,
                             APP_DYNAMIC_LABEL_START, APP_DYNAMIC_LABEL_CONT,
                             APP_MOT_START, APP_MOT_CONT, DynamicLabelDecoder)
from tpudab.mot.mot import (MOTObject, MOTAssembler, build_mot_object_groups,
                            ContentType, PARAM_CATEGORY_SLIDE_ID,
                            PARAM_CATEGORY_TITLE, IMAGE_PNG)
from tpudab.mot.slideshow import SlideshowManager
from tpudab.data.packet import PacketChannel, build_packets, parse_packet


# ---------------- codecs (native shim) ----------------

def test_mp2_encode_decode_roundtrip():
    from tpudab.audio.codecs import MP2Encoder, MP2Decoder, mp2_decode_available
    assert mp2_decode_available()
    enc = MP2Encoder(48000, 2, 128)
    t = np.arange(enc.frame_size)
    tone = (8000 * np.sin(2 * np.pi * 440 * t / 48000)).astype(np.int16)
    pcm = np.stack([tone, tone], axis=1)
    packets = b"".join(enc.encode(pcm) for _ in range(8)) + enc.flush()
    dec = MP2Decoder()
    out = dec.decode(packets)
    assert dec.sample_rate == 48000 and dec.channels == 2
    assert out.shape[0] >= 6 * 1152
    # decoded energy should be in the right ballpark (lossy codec)
    rms_in, rms_out = np.sqrt(np.mean(pcm.astype(float) ** 2)), \
        np.sqrt(np.mean(out[1152:].astype(float) ** 2))
    assert 0.5 < rms_out / rms_in < 2.0


def test_aac_960_decode():
    """libavcodec must accept DAB+ 960-frame ASC and produce 960-sample frames."""
    from tpudab.audio.codecs import (_ShimEncoder, _ShimDecoder,
                                     audio_specific_config, aac_decode_available)
    assert aac_decode_available()
    enc = _ShimEncoder("aac", 48000, 2, 128000)
    t = np.arange(enc.frame_size)
    tone = (8000 * np.sin(2 * np.pi * 1000 * t / 48000)).astype(np.int16)
    pcm = np.stack([tone, tone], axis=1)
    pkts = [p for p in (enc.encode(pcm) for _ in range(3)) if p]
    dec = _ShimDecoder("aac", audio_specific_config(48000, 2, frame_960=True))
    out = dec.decode(pkts[0])
    assert out.shape[0] % 960 == 0


# ---------------- audio pipeline ----------------

def test_resampler_preserves_tone():
    rs = Resampler(32000, 48000)
    t = np.arange(3200)
    x = np.sin(2 * np.pi * 440 * t / 32000).astype(np.float32)
    x = np.stack([x, x], axis=1)
    out = np.concatenate([rs.process(c) for c in np.split(x, 4)])
    assert abs(out.shape[0] - 4800) <= 4
    # output should still be a clean ~440 Hz tone at 48k
    spec = np.abs(np.fft.rfft(out[100:4500, 0] * np.hanning(4400)))
    peak_hz = np.argmax(spec) * 48000 / 4400
    assert abs(peak_hz - 440) < 15


def test_pipeline_mixes_sources(tmp_path):
    pipe = AudioPipeline(sink_rate=48000)
    s1 = pipe.add_source(1)
    s2 = pipe.add_source(2)
    t = np.arange(4800)
    s1.write((10000 * np.sin(2 * np.pi * 440 * t / 48000)).astype(np.int16), 48000)
    s2.write((10000 * np.sin(2 * np.pi * 880 * t[:3200] / 32000)).astype(np.int16), 32000)
    mixed = pipe.mix(4000)
    assert mixed.shape == (4000, 2)
    assert np.abs(mixed).max() > 0.1
    sink = WavSink(str(tmp_path / "out.wav"))
    sink.write(mixed)
    sink.close()
    import wave
    with wave.open(str(tmp_path / "out.wav")) as w:
        assert w.getnframes() == 4000
        assert w.getframerate() == 48000


# ---------------- PAD / dynamic labels ----------------

def test_dynamic_label_roundtrip():
    dec = DynamicLabelDecoder()
    for seg in build_dynamic_label_segments("Now Playing: TPU Radio — Symphony No. 5"):
        dec.push_segment(seg)
    assert dec.label == "Now Playing: TPU Radio — Symphony No. 5".encode(
        "latin-1", "replace").decode("latin-1")
    assert dec.stats["crc_errors"] == 0


def test_xpad_dynamic_label_through_aus():
    proc = XPADProcessor()
    segs = build_dynamic_label_segments("Hello DAB World")
    aus = []
    for seg in segs:
        # one segment per AU, split across start subfield(s)
        au = build_xpad_into_au(b"\xaa" * 50,
                               [(APP_DYNAMIC_LABEL_START, seg[:16]),
                                (APP_DYNAMIC_LABEL_CONT, seg[16:])] if len(seg) > 16
                               else [(APP_DYNAMIC_LABEL_START, seg)])
        aus.append(au)
    for au in aus:
        payload, fpad, xpad = extract_pad_from_dabplus_au(au)
        assert payload == b"\xaa" * 50
        proc.push(fpad, xpad)
    assert proc.dynamic_label.label == "Hello DAB World"


# ---------------- MOT / slideshow ----------------

def test_mot_object_roundtrip():
    rng = np.random.default_rng(0)
    body = rng.integers(0, 256, 1000).astype(np.uint8).tobytes()
    obj = MOTObject(transport_id=0x1234, content_type=ContentType.IMAGE,
                    content_subtype=IMAGE_PNG, body=body,
                    content_name="slide.png",
                    params={PARAM_CATEGORY_SLIDE_ID: bytes([3, 7]),
                            PARAM_CATEGORY_TITLE: b"News"})
    groups = build_mot_object_groups(obj, segment_size=100)
    asm = MOTAssembler()
    for g in groups:
        asm.push_data_group(g)
    assert asm.stats["objects"] == 1
    got = asm.objects[0x1234]
    assert got.body == body
    assert got.content_name == "slide.png"
    assert got.content_subtype == IMAGE_PNG


def test_slideshow_manager_via_xpad():
    rng = np.random.default_rng(1)
    body = rng.integers(0, 256, 600).astype(np.uint8).tobytes()
    obj = MOTObject(transport_id=7, content_type=ContentType.IMAGE,
                    content_subtype=IMAGE_PNG, body=body,
                    content_name="np.png",
                    params={PARAM_CATEGORY_SLIDE_ID: bytes([1, 2])})
    mgr = SlideshowManager()
    proc = XPADProcessor(on_mot_data_group=mgr.push_data_group)
    for g in build_mot_object_groups(obj, segment_size=64):
        # prefix each data group with its 2-byte length, chunk into X-PAD
        framed = bytes([(len(g) >> 8) & 0x3F, len(g) & 0xFF]) + g
        chunks = [framed[i : i + 48] for i in range(0, len(framed), 48)]
        for j, ch in enumerate(chunks):
            app = APP_MOT_START if j == 0 else APP_MOT_CONT
            au = build_xpad_into_au(b"", [(app, ch)])
            _, fpad, xpad = extract_pad_from_dabplus_au(au)
            proc.push(fpad, xpad)
    slides = mgr.slides
    assert len(slides) == 1
    assert slides[0].data == body
    assert slides[0].image_format == "PNG"
    assert (slides[0].category_id, slides[0].slide_id) == (1, 2)


# ---------------- packet mode ----------------

def test_packet_channel_roundtrip():
    rng = np.random.default_rng(2)
    groups_in = [rng.integers(0, 256, n).astype(np.uint8).tobytes()
                 for n in (50, 300, 91)]
    stream = b""
    for g in groups_in:
        for p in build_packets(0x155, g, packet_size=96):
            stream += p
    ch = PacketChannel(address=0x155)
    groups_out = ch.process_bytes(stream)
    assert groups_out == groups_in
    assert ch.stats["crc_errors"] == 0


def test_packet_other_address_ignored():
    g = b"hello world"
    stream = b"".join(build_packets(0x20, g, 24))
    ch = PacketChannel(address=0x155)
    assert ch.process_bytes(stream) == []


def test_packet_parse_fields():
    p = parse_packet(build_packets(0x3FF, b"abc", 24)[0])
    assert p.address == 0x3FF and p.first and p.last and p.crc_ok
    assert p.data == b"abc"


def test_packet_mode_slideshow_end_to_end():
    """Packet-mode data subchannel carrying an MOT slideshow."""
    rng = np.random.default_rng(3)
    body = rng.integers(0, 256, 2000).astype(np.uint8).tobytes()
    obj = MOTObject(transport_id=99, content_type=ContentType.IMAGE,
                    content_subtype=1, body=body, content_name="img.jpg")
    mgr = SlideshowManager()
    ch = PacketChannel(address=1, on_data_group=mgr.push_data_group)
    stream = b""
    for g in build_mot_object_groups(obj, segment_size=256):
        stream += b"".join(build_packets(1, g, 96))
    ch.process_bytes(stream)
    assert len(mgr.slides) == 1
    assert mgr.slides[0].data == body
    assert mgr.slides[0].image_format == "JPEG"
