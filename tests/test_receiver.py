"""Full-chain integration (BASELINE configs 1-3): synthesized ensemble IQ with
impairments -> OfflinePipeline -> database + bit-exact DAB+ access units."""

import numpy as np
import pytest

from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                          EnsembleSynthesizer, ASCTY_DAB_PLUS)
from tpudab.synth.modulator import Impairments, apply_impairments, modulate_frame_bits
from tpudab.audio.superframe import (SuperFrameHeader, build_superframe,
                                     FRAMES_PER_SUPERFRAME, header_size_bytes)
from tpudab.models.pipeline import decode_iq


@pytest.fixture(scope="module")
def ensemble_capture():
    rng = np.random.default_rng(42)
    bitrate = 48
    hdr = SuperFrameHeader(dac_rate=1, sbr_flag=0, aac_channel_mode=1,
                           ps_flag=0, mpeg_surround=0)
    n_frames = 14
    n_logical = n_frames * 4
    all_aus, sfs = [], []
    for _ in range(n_logical // FRAMES_PER_SUPERFRAME + 1):
        avail = 110 * bitrate // 8 - header_size_bytes(6) - 6 * 2
        sizes = [avail // 6] * 5 + [avail - 5 * (avail // 6)]
        aus = [rng.integers(0, 256, s).astype(np.uint8).tobytes() for s in sizes]
        all_aus.append(aus)
        sfs.append(build_superframe(hdr, aus, bitrate))
    payload = np.concatenate(sfs).reshape(-1, bitrate * 3)

    spec = EnsembleSpec(
        ensemble_id=0x8E15, label="E2E Mux",
        services=[ServiceSpec(0xD111, "DAB+ One", [(0, ASCTY_DAB_PLUS, 4)],
                              programme_type=12)],
        subchannels=[SubchannelSpec(4, start_cu=0, size_cu=36,
                                    protection=("eep", 3, 0))])
    synth = EnsembleSynthesizer(spec, seed=5)
    synth.payload_fn[4] = lambda m: payload[m].tobytes()
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(n_frames)])
    return iq, all_aus, hdr


def test_offline_pipeline_end_to_end(ensemble_capture):
    iq, all_aus, hdr = ensemble_capture
    iq = apply_impairments(iq, Impairments(freq_offset_hz=21_700.0,
                                           delay_samples=500, snr_db=12, seed=6))
    receiver, acc, stats = decode_iq(iq, batch_frames=4)

    # config 1: database bit-exact
    db = receiver.db
    assert db.ensemble.label == "E2E Mux"
    assert db.services[0xD111].label == "DAB+ One"
    assert db.subchannels[4].protection_label == "EEP 3-A"
    assert receiver.stats["fib_crc_errors"] == 0
    assert stats.reacquisitions == 0

    # config 2: bit-exact AAC access units through the OFDM channel
    outs = acc[4]
    got_sfs = [sf for o in outs for sf in o.superframes]
    assert len(got_sfs) >= 8
    for res in got_sfs:
        assert res.firecode_ok and res.rs_ok and all(res.au_crc_ok)
        assert res.header == hdr
    flat_got = [bytes(a) for res in got_sfs for a in res.access_units]
    flat_want = [bytes(a) for aus in all_aus for a in aus]
    assert flat_got == flat_want[: len(flat_got)]
    assert len(flat_got) >= 48


def test_pipeline_noise_only_does_not_crash():
    rng = np.random.default_rng(7)
    noise = 0.1 * (rng.standard_normal(3 * 196608)
                   + 1j * rng.standard_normal(3 * 196608)).astype(np.complex64)
    receiver, acc, stats = decode_iq(noise, batch_frames=2)
    assert receiver.db.ensemble.label == ""
    assert acc == {}


def test_packet_data_service_slideshow_end_to_end():
    """A packet-mode data subchannel carrying an MOT slideshow, through the
    full chain: synth -> frame bits -> Receiver -> SlideshowManager."""
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer, TMID_PACKET_DATA)
    from tpudab.mot.mot import MOTObject, build_mot_object_groups, ContentType
    from tpudab.data.packet import build_packets
    from tpudab.models.receiver import Receiver, DataPacketChannel
    from tpudab.utils.bits import bits_to_soft

    rng = np.random.default_rng(9)
    from tpudab.mot.imagemeta import TINY_PNG
    img = TINY_PNG + rng.integers(0, 256, 1200 - len(TINY_PNG)).astype(np.uint8).tobytes()
    obj = MOTObject(transport_id=42, content_type=ContentType.IMAGE,
                    content_subtype=1, body=img, content_name="cover.jpg")
    pkt_stream = b""
    for g in build_mot_object_groups(obj, segment_size=256):
        pkt_stream += b"".join(build_packets(2, g, 96))

    bitrate = 32  # EEP 3-A, 24 CU -> 96 bytes per logical frame
    spec = EnsembleSpec(
        ensemble_id=0x7777, label="Data Mux",
        services=[ServiceSpec(0xE100, "Slides", [(TMID_PACKET_DATA, 60, 9)])],
        subchannels=[SubchannelSpec(9, start_cu=0, size_cu=24,
                                    protection=("eep", 3, 0))])
    synth = EnsembleSynthesizer(spec, seed=11)
    frame_bytes = bitrate * 3
    n_frames = 10
    need = (n_frames * 4 + 16) * frame_bytes
    # pad the packet stream with 24-byte padding packets (addr 0)
    pad_pkt = build_packets(0, b"", 24)[0]
    stream = pkt_stream + pad_pkt * ((need - len(pkt_stream)) // 24 + 1)
    stream = np.frombuffer(stream[:need], np.uint8).reshape(-1, frame_bytes)
    synth.payload_fn[9] = lambda m: stream[m].tobytes()

    soft = bits_to_soft(np.stack([synth.frame_bits(i) for i in range(n_frames)]))
    rx = Receiver()
    rx.process_frame_bits(soft)
    ch = rx.channels.get(9)
    assert isinstance(ch, DataPacketChannel)
    slides = ch.slideshow.slides
    assert len(slides) == 1
    assert slides[0].data == img
    assert slides[0].name == "cover.jpg"


def test_device_step_pipeline_matches_python_path(ensemble_capture):
    """use_device_step pipeline (jitted ReceiveStep with carry handoff) must
    produce the same subchannel bytes as the python decoder path."""
    iq, all_aus, hdr = ensemble_capture
    r1, acc1, _ = decode_iq(iq, batch_frames=5)
    r2, acc2, _ = decode_iq(iq, batch_frames=5, use_device_step=True)
    assert r2.db.ensemble.label == r1.db.ensemble.label
    f1 = np.concatenate([o.raw_frames for o in acc1[4]
                         if o.raw_frames is not None and o.raw_frames.shape[0]])
    f2 = np.concatenate([o.raw_frames for o in acc2[4]
                         if o.raw_frames is not None and o.raw_frames.shape[0]])
    m = min(f1.shape[0], f2.shape[0])
    assert m > 30
    np.testing.assert_array_equal(f1[:m], f2[:m])
    sfs1 = [sf for o in acc1[4] for sf in o.superframes]
    sfs2 = [sf for o in acc2[4] for sf in o.superframes]
    flat1 = [bytes(a) for sf in sfs1 for a in sf.access_units]
    flat2 = [bytes(a) for sf in sfs2 for a in sf.access_units]
    mm = min(len(flat1), len(flat2))
    assert flat1[:mm] == flat2[:mm]


def test_heterogeneous_eep_profiles_end_to_end():
    """Four subchannels with DIFFERENT protection profiles at once — EEP
    1-A, 4-A (set A extremes) and 2-B, 3-B (set B, never exercised end to
    end before r5) — decode bit-exactly on the host path AND the device
    step, whose profile-grouping runs four separate Viterbi groups here
    (every other e2e test uses a single profile = one group)."""
    from tpudab.models.pipeline import decode_iq
    from tpudab.models.receiver import Receiver
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer)
    from tpudab.synth.modulator import modulate_frame_bits

    layout = [  # (subch_id, start, size, protection, bitrate_kbps)
        (1, 0, 12, ("eep", 1, 0), 8),     # 1-A, n=1
        (2, 12, 28, ("eep", 4, 0), 56),   # 4-A, n=7
        (3, 40, 21, ("eep", 2, 1), 32),   # 2-B, n=1
        (4, 61, 54, ("eep", 3, 1), 96),   # 3-B, n=3
    ]
    spec = EnsembleSpec(
        ensemble_id=0x4EEB, label="Hetero Mux",
        services=[ServiceSpec(0xA400 + sid, f"Svc {sid}", [(0, 0, sid)])
                  for sid, *_ in layout],
        subchannels=[SubchannelSpec(sid, start_cu=st, size_cu=sz,
                                    protection=prot)
                     for sid, st, sz, prot, _ in layout])
    synth = EnsembleSynthesizer(spec, seed=60)
    rng = np.random.default_rng(61)
    pay = {sid: rng.integers(0, 256, (52, br * 3)).astype(np.uint8)
           for sid, *_, br in layout}
    for sid in pay:
        synth.payload_fn[sid] = (lambda s: lambda m: pay[s][m].tobytes())(sid)
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(10)]).astype(np.complex64)

    rx_h, acc_h, _ = decode_iq(iq, batch_frames=5,
                               receiver=Receiver(decode_audio=False))
    rx_d, acc_d, _ = decode_iq(iq, batch_frames=5, use_device_step=True,
                               receiver=Receiver(decode_audio=False))
    for sid, *_ in layout:
        for acc in (acc_h, acc_d):
            got = np.concatenate([o.raw_frames for o in acc[sid]
                                  if o.raw_frames is not None
                                  and len(o.raw_frames)])
            assert got.shape[0] >= 20, (sid, got.shape)
            np.testing.assert_array_equal(got, pay[sid][: got.shape[0]],
                                          err_msg=f"subch {sid}")


def test_dropout_resync(ensemble_capture):
    """A mid-capture blackout must trigger reacquisition and decoding must
    resume afterwards (reference failure-recovery analog: desync counter +
    state-machine fallback, SURVEY.md sec 5.3)."""
    iq, _, _ = ensemble_capture
    iq = apply_impairments(iq, Impairments(freq_offset_hz=5_000.0,
                                           snr_db=20, seed=12))
    corrupted = iq.copy()
    # 3-frame blackout starting mid-capture
    lo = 4 * 196608 + 1234
    corrupted[lo : lo + 3 * 196608] = 0
    receiver, acc, stats = decode_iq(corrupted, batch_frames=2)
    assert stats.reacquisitions >= 1
    assert receiver.db.ensemble.label == "E2E Mux"
    # FIBs decoded fine both before and after the blackout
    ok_frames = receiver.stats["fibs"] - receiver.stats["fib_crc_errors"]
    assert ok_frames >= 7 * 12
