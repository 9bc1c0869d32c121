"""Online UEP region-table self-calibration (fec/uep_calibrate.py).

The 10 budget-solved ('s') UEP rows ship with quantified ambiguity
(UEP_AMBIGUITY.json). These tests prove the receiver resolves that
ambiguity from the signal itself: an ensemble synthesized with a
deliberately DIFFERENT (alternative-candidate) region table decodes
cleanly anyway (VERDICT r4 'Next round' item 2 done-condition).
"""

import numpy as np
import pytest

from tpudab.constants.puncture import get_uep_profile
from tpudab.fec.conv import conv_encode
from tpudab.fec.depuncture import puncture
from tpudab.fec.uep_calibrate import (CALIBRATION_FRAMES, calibrate,
                                      candidate_profiles, needs_calibration)

KEY = (128, 2)  # an 's' (budget-solved) row: 116 CU, MP2 classic DAB


def _logical_soft(prof, n_frames=CALIBRATION_FRAMES, seed=0, snr_amp=0.15):
    """Soft codewords u_m as they come out of the time deinterleaver, for
    data encoded/punctured under `prof`."""
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_frames):
        bits = rng.integers(0, 2, prof.data_bits).astype(np.uint8)
        p = puncture(conv_encode(bits), prof.to_profile())
        soft = (1.0 - 2.0 * p).astype(np.float32)
        if prof.padding_bits:
            soft = np.concatenate(
                [soft, np.zeros(prof.padding_bits, np.float32)])
        rows.append(soft + snr_amp * rng.standard_normal(soft.shape[0]))
    return np.stack(rows)


def test_candidates_shipped_first():
    cands = candidate_profiles(*KEY)
    assert len(cands) >= 10
    assert cands[0] == get_uep_profile(*KEY)
    assert all(c.consistent() for c in cands)
    assert needs_calibration(*KEY)
    assert not needs_calibration(128, 5)  # 'a' row


def test_calibrate_confirms_shipped_table():
    res = calibrate(_logical_soft(get_uep_profile(*KEY)), *KEY)
    assert res.locked and not res.swapped
    assert res.best_score < 0.005
    assert res.runner_up_score - res.best_score >= 0.0025


@pytest.mark.parametrize("alt_idx", [1, 5, 11])
def test_calibrate_recovers_alternative_table(alt_idx):
    """Signal punctured with an alternative candidate: calibration must
    lock onto exactly that candidate."""
    alt = candidate_profiles(*KEY)[alt_idx]
    res = calibrate(_logical_soft(alt, seed=alt_idx), *KEY)
    assert res.locked and res.swapped
    assert (res.chosen.l, res.chosen.pi, res.chosen.padding_bits) == \
        (alt.l, alt.pi, alt.padding_bits)
    assert res.best_score < 0.005
    assert res.runner_up_score - res.best_score >= 0.0025


def test_full_enumeration_and_deep_candidate_recovery():
    """The candidate set is the FULL enumeration (10^2-10^3 rows, not a
    truncated sample), and calibration recovers a candidate DEEP in it —
    far outside any top-12 subset (r5 review finding) — via the
    parity-check proxy + exact top-K scoring, under noise."""
    cands = candidate_profiles(*KEY)
    assert len(cands) >= 1000  # UEP_AMBIGUITY.json counts 3432 for 128/2
    deep = len(cands) * 3 // 4
    alt = cands[deep]
    res = calibrate(_logical_soft(alt, seed=7, snr_amp=0.45), *KEY)
    assert res.locked and res.swapped
    assert (res.chosen.l, res.chosen.pi, res.chosen.padding_bits) == \
        (alt.l, alt.pi, alt.padding_bits)


def test_deep_candidate_recovery_other_rows():
    """Row-specific structure check: 224/PL2 (the largest candidate set,
    ~7.7k, all regions PI>=10 so fully proxy-checkable) recovers a deep
    alternative."""
    key = (224, 2)
    cands = candidate_profiles(*key)
    assert len(cands) >= 5000
    alt = cands[len(cands) * 2 // 3]
    res = calibrate(_logical_soft(alt, seed=9, snr_amp=0.3), *key)
    assert res.locked and res.swapped
    assert (res.chosen.l, res.chosen.pi) == (alt.l, alt.pi)


def test_weak_region_row_stays_honest():
    """320/PL5 has PI (8,5,2,6): only region 1 is parity-checkable, so the
    CPU proxy is partially blind. The decisive property: calibration must
    never LOCK a wrong table — on a shipped-table broadcast it either
    locks the shipped row or honestly reports ambiguous (keeping
    shipped)."""
    key = (320, 5)
    shipped = get_uep_profile(*key)
    res = calibrate(_logical_soft(shipped, seed=10), *key)
    assert (res.chosen.l, res.chosen.pi, res.chosen.padding_bits) == \
        (shipped.l, shipped.pi, shipped.padding_bits)
    assert not res.swapped


def test_parity_proxy_ranks_true_alignment():
    """The stage-1 proxy (mother-code parity checks, no Viterbi) gives the
    true table a near-zero violation rate and ranks it first among all
    enumerated candidates; misaligned tables sit near 0.5."""
    from tpudab.fec.uep_calibrate import _proxy_scores

    cands = candidate_profiles(*KEY)
    true_idx = 500
    soft = _logical_soft(cands[true_idx], seed=500)
    recv = (np.asarray(soft, np.float32) < 0).astype(np.uint8)
    proxy = _proxy_scores(recv, cands)
    assert int(np.argmin(proxy)) == true_idx
    assert proxy[true_idx] < 0.02
    assert np.median(proxy) > 0.3  # misaligned candidates ~50% violations


def test_ensemble_with_alternative_table_decodes_cleanly(monkeypatch):
    """End to end at frame-bits level: the synthesizer transmits subchannel
    payloads under an ALTERNATIVE region table (as a real broadcast with a
    mistranscribed row would); the receiver ships the suspect row, self-
    calibrates on the first frames, and recovers the payload bit-exactly."""
    import tpudab.synth.ensemble as synth_mod
    from tpudab.models.receiver import Receiver
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer)
    from tpudab.utils.bits import bits_to_soft

    alt = candidate_profiles(*KEY)[4]
    real_get = synth_mod.get_uep_profile
    monkeypatch.setattr(
        synth_mod, "get_uep_profile",
        lambda br, pl: alt if (br, pl) == KEY else real_get(br, pl))

    spec = EnsembleSpec(
        ensemble_id=0xCA11, label="Calib Mux",
        services=[ServiceSpec(0xB200, "MP2 Alt", [(0, 0, 6)])],
        subchannels=[SubchannelSpec(6, start_cu=0, size_cu=116,
                                    protection=("uep",) + KEY)])
    synth = EnsembleSynthesizer(spec, seed=21)
    rng = np.random.default_rng(33)
    frame_bytes = KEY[0] * 3
    payload = rng.integers(0, 256, (64, frame_bytes)).astype(np.uint8)
    synth.payload_fn[6] = lambda m: payload[m].tobytes()

    n_frames = 10
    soft = bits_to_soft(np.stack([synth.frame_bits(i)
                                  for i in range(n_frames)]))
    rx = Receiver(decode_audio=False)
    outs = rx.process_frame_bits(soft)

    cal = rx.uep_calibrations[6]
    assert cal.locked and cal.swapped
    assert (cal.chosen.l, cal.chosen.pi, cal.chosen.padding_bits) == \
        (alt.l, alt.pi, alt.padding_bits)

    got = np.asarray(outs[6].raw_frames)
    assert got.shape[0] >= 20
    np.testing.assert_array_equal(got, payload[: got.shape[0]])


def test_device_step_waits_for_calibration_and_matches_host(monkeypatch):
    """Full pipeline with use_device_step=True on an alternative-table
    broadcast: the jitted ReceiveStep must NOT be built until the
    calibration locks (StepDriver.maybe_build guard), must bake the
    calibrated table, and must emit the same bytes as the host path."""
    import tpudab.synth.ensemble as synth_mod
    from tpudab.models.pipeline import decode_iq
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer)
    from tpudab.synth.modulator import modulate_frame_bits

    alt = candidate_profiles(*KEY)[4]
    real_get = synth_mod.get_uep_profile
    monkeypatch.setattr(
        synth_mod, "get_uep_profile",
        lambda br, pl: alt if (br, pl) == KEY else real_get(br, pl))

    spec = EnsembleSpec(
        ensemble_id=0xCA13, label="Calib Mux3",
        services=[ServiceSpec(0xB202, "MP2 Dev", [(0, 0, 6)])],
        subchannels=[SubchannelSpec(6, start_cu=0, size_cu=116,
                                    protection=("uep",) + KEY)])
    synth = EnsembleSynthesizer(spec, seed=23)
    rng = np.random.default_rng(35)
    payload = rng.integers(0, 256, (64, KEY[0] * 3)).astype(np.uint8)
    synth.payload_fn[6] = lambda m: payload[m].tobytes()
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(10)]).astype(np.complex64)

    from tpudab.models.receiver import Receiver

    rx_h, acc_h, _ = decode_iq(iq, batch_frames=5,
                               receiver=Receiver(decode_audio=False))
    rx_d, acc_d, _ = decode_iq(iq, batch_frames=5, use_device_step=True,
                               receiver=Receiver(decode_audio=False))
    for rx in (rx_h, rx_d):
        cal = rx.uep_calibrations[6]
        assert cal.locked and cal.swapped
        assert (cal.chosen.l, cal.chosen.pi) == (alt.l, alt.pi)
    want = np.concatenate([o.raw_frames for o in acc_h[6]
                           if o.raw_frames is not None and len(o.raw_frames)])
    got = np.concatenate([o.raw_frames for o in acc_d[6]
                          if o.raw_frames is not None and len(o.raw_frames)])
    m = min(want.shape[0], got.shape[0])
    assert m >= 20
    np.testing.assert_array_equal(got[:m], want[:m])
    np.testing.assert_array_equal(want[:m], payload[:m])


def test_late_discovered_s_row_demotes_and_rebuilds_device_step():
    """A subchannel with an 's' UEP row discovered AFTER the jitted step
    was built must not deadlock (r5 review finding): the driver demotes to
    the host path (handing the device deinterleaver carries back), the
    calibration runs there, and the step rebuilds with every subchannel."""
    from tpudab.models.pipeline import OfflinePipeline
    from tpudab.models.receiver import Receiver
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer, ASCTY_DAB_PLUS)
    from tpudab.synth.modulator import modulate_frame_bits

    def capture(with_b):
        services = [ServiceSpec(0xB300, "EEP A", [(0, ASCTY_DAB_PLUS, 1)])]
        subchannels = [SubchannelSpec(1, start_cu=0, size_cu=24,
                                      protection=("eep", 3, 0))]
        if with_b:
            services.append(ServiceSpec(0xB301, "UEP B", [(0, 0, 6)]))
            subchannels.append(SubchannelSpec(6, start_cu=24, size_cu=116,
                                              protection=("uep",) + KEY))
        spec = EnsembleSpec(ensemble_id=0xD155, label="Late Mux",
                            services=services, subchannels=subchannels)
        synth = EnsembleSynthesizer(spec, seed=40)
        rng = np.random.default_rng(41)
        pay = {sid: rng.integers(0, 256, (64, nb)).astype(np.uint8)
               for sid, nb in ([(1, 32 * 3)] + ([(6, KEY[0] * 3)]
                                                if with_b else []))}
        for sid in pay:
            synth.payload_fn[sid] = (lambda s: lambda m: pay[s][m].tobytes())(sid)
        n_frames = 16 if with_b else 8
        iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                             for i in range(n_frames)]).astype(np.complex64)
        return iq, pay

    iq_a, _ = capture(False)
    iq_ab, pay = capture(True)

    pipe = OfflinePipeline(batch_frames=4, use_device_step=True,
                           receiver=Receiver(decode_audio=False))
    pipe.run(iq_a)
    assert pipe._driver.step is not None                    # built with A only
    assert {c.subch_id for c in pipe._driver.step.subchannels} == {1}

    acc = pipe.run(iq_ab)                                   # B discovered late
    # the step was rebuilt and now covers BOTH subchannels
    assert pipe._driver.step is not None
    assert {c.subch_id for c in pipe._driver.step.subchannels} == {1, 6}
    cal = pipe.receiver.uep_calibrations[6]
    assert cal.locked and not cal.swapped
    # B's decoder first saw the stream at absolute CIF 16 (it was created
    # after the device step processed batch 1), so its first complete
    # logical frame is absolute frame 16
    got = np.concatenate([o.raw_frames for o in acc[6]
                          if o.raw_frames is not None and len(o.raw_frames)])
    assert got.shape[0] >= 8
    np.testing.assert_array_equal(got, pay[6][16 : 16 + got.shape[0]])


def test_short_capture_flushes_held_frames():
    """A capture that ends INSIDE the calibration window (fewer complete
    frames than CALIBRATION_FRAMES) still emits its frames: finalize()
    calibrates on whatever is buffered and flushes."""
    from tpudab.models.receiver import Receiver
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer)
    from tpudab.utils.bits import bits_to_soft

    spec = EnsembleSpec(
        ensemble_id=0xCA14, label="Short Mux",
        services=[ServiceSpec(0xB203, "MP2 Short", [(0, 0, 6)])],
        subchannels=[SubchannelSpec(6, start_cu=0, size_cu=116,
                                    protection=("uep",) + KEY)])
    synth = EnsembleSynthesizer(spec, seed=24)
    rng = np.random.default_rng(36)
    payload = rng.integers(0, 256, (16, KEY[0] * 3)).astype(np.uint8)
    synth.payload_fn[6] = lambda m: payload[m].tobytes()

    # 4 frames = 16 CIFs -> only 1 complete logical frame: held
    soft = bits_to_soft(np.stack([synth.frame_bits(i) for i in range(4)]))
    rx = Receiver(decode_audio=False)
    outs = rx.process_frame_bits(soft)
    held = outs.get(6)
    assert held is None or held.raw_frames.shape[0] == 0

    final = rx.finalize()
    got = np.asarray(final[6].raw_frames)
    assert got.shape[0] == 1
    np.testing.assert_array_equal(got[0], payload[0])
    assert rx.uep_calibrations[6] is not None
    # a second finalize is a no-op
    assert rx.finalize() == {}


def test_ensemble_with_shipped_table_not_swapped():
    """Control: a broadcast using the shipped table must calibrate to it
    (no spurious swap) and decode bit-exactly."""
    from tpudab.models.receiver import Receiver
    from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                              EnsembleSynthesizer)
    from tpudab.utils.bits import bits_to_soft

    spec = EnsembleSpec(
        ensemble_id=0xCA12, label="Calib Mux2",
        services=[ServiceSpec(0xB201, "MP2 Std", [(0, 0, 6)])],
        subchannels=[SubchannelSpec(6, start_cu=0, size_cu=116,
                                    protection=("uep",) + KEY)])
    synth = EnsembleSynthesizer(spec, seed=22)
    rng = np.random.default_rng(34)
    payload = rng.integers(0, 256, (64, KEY[0] * 3)).astype(np.uint8)
    synth.payload_fn[6] = lambda m: payload[m].tobytes()

    soft = bits_to_soft(np.stack([synth.frame_bits(i) for i in range(10)]))
    rx = Receiver(decode_audio=False)
    outs = rx.process_frame_bits(soft)

    cal = rx.uep_calibrations[6]
    assert cal.locked and not cal.swapped
    got = np.asarray(outs[6].raw_frames)
    np.testing.assert_array_equal(got, payload[: got.shape[0]])
