"""Streaming robustness: sample-clock drift tracking + graded desync
(VERDICT round-1 #6). The reference's sample-serial state machine re-locks
timing continuously; the block streaming loop must do the same via the
per-batch PRS timing recheck, and must resync on a PARTIALLY broken lock
(graded FIB error-rate trigger), not only on a full blackout."""

import numpy as np
import pytest

from tpudab.synth import (EnsembleSpec, ServiceSpec, SubchannelSpec,
                          EnsembleSynthesizer, ASCTY_DAB_PLUS)
from tpudab.synth.modulator import (Impairments, apply_impairments,
                                    modulate_frame_bits)
from tpudab.host.streaming import StreamingRadio


def _capture(n_frames: int, seed: int = 7) -> np.ndarray:
    spec = EnsembleSpec(
        ensemble_id=0x77AA, label="Drift Mux",
        services=[ServiceSpec(0xD222, "Drifty", [(0, ASCTY_DAB_PLUS, 2)])],
        subchannels=[SubchannelSpec(2, start_cu=0, size_cu=24,
                                    protection=("eep", 3, 0))])
    synth = EnsembleSynthesizer(spec, seed=seed)
    return np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                           for i in range(n_frames)])


def _buffer_source(iq: np.ndarray):
    state = {"pos": 0}

    def source(n):
        lo = state["pos"]
        state["pos"] = min(lo + n, iq.shape[0])
        return iq[lo: state["pos"]]

    return source


def _run(iq, **kw):
    radio = StreamingRadio(_buffer_source(iq), **kw)
    radio.run()
    return radio


@pytest.mark.slow
@pytest.mark.parametrize("ppm", [100.0, -100.0])
def test_clock_drift_holds_lock(ppm):
    """+-100 ppm sample-clock offset over a long capture: the per-batch PRS
    timing recheck must keep the lock (drift is ~19.7 samples/frame at
    100 ppm), and the fractional resampler must LEARN the rate so the
    +/-32-sample jump corrections taper off instead of firing every batch."""
    iq = _capture(18)
    iq = apply_impairments(iq, Impairments(freq_offset_hz=800.0, snr_db=22,
                                           clock_ppm=ppm, seed=3))
    radio = _run(iq, batch_frames=2)
    st = radio.receiver.stats
    assert radio.stats.total_frames >= 14
    err_rate = st["fib_crc_errors"] / max(st["fibs"], 1)
    assert err_rate < 0.1, (err_rate, radio.stats)
    assert radio.stats.timing_adjustments >= 1  # jump path trained it...
    # ...and the learned rate matches the injected clock offset. (sign:
    # +ppm RX clock stretches the signal -> consume >1 input per output)
    assert abs(radio._drift_ppm - ppm) < 40.0, (radio._drift_ppm, ppm)
    assert radio._resampler is not None
    assert radio.stats.reacquisitions == 0
    assert radio.receiver.db.ensemble.label == "Drift Mux"


@pytest.mark.slow
def test_clock_drift_audio_continuity():
    """STATUS r1 delta #4 / VERDICT r2 item #6: under +100 ppm clock drift
    the decoded logical-frame byte stream must be CONTINUOUS — no dropped or
    duplicated logical frames across timing corrections. Decodes the same
    payload with and without drift and requires identical bytes."""
    from tpudab.constants.puncture import eep_profile
    from tpudab.msc.subchannel import SubchannelConfig
    from tpudab.synth.modulator import modulate_frame_bits

    n_frames = 16
    spec = EnsembleSpec(
        ensemble_id=0x77AB, label="Cont Mux",
        services=[ServiceSpec(0xD223, "Cont", [(0, ASCTY_DAB_PLUS, 2)])],
        subchannels=[SubchannelSpec(2, start_cu=0, size_cu=24,
                                    protection=("eep", 3, 0))])
    synth = EnsembleSynthesizer(spec, seed=8)
    rng = np.random.default_rng(88)
    data = rng.integers(0, 256, (n_frames * 4, 32 * 3)).astype(np.uint8)
    synth.payload_fn[2] = lambda m: data[m].tobytes()
    iq = np.concatenate([modulate_frame_bits(synth.frame_bits(i))
                         for i in range(n_frames)])
    iq = apply_impairments(iq, Impairments(snr_db=30, clock_ppm=100.0,
                                           seed=9))

    got = []
    radio = StreamingRadio(_buffer_source(iq), batch_frames=2)
    radio.run(on_outputs=lambda outs: got.extend(
        o.raw_frames for o in outs.values()
        if o.raw_frames is not None and len(o.raw_frames)))
    stream = np.concatenate(got)
    # continuous: every decoded logical frame matches the payload in order,
    # no gaps/repeats (deinterleaver warm-up drops the first 15 logicals)
    # the 16-deep deinterleaver delays the tail by 15 logicals and the
    # resampler's filter history may cost the final (partial) transmission
    # frame at stream end — but NOTHING inside may be missing or repeated
    assert stream.shape[0] >= n_frames * 4 - 15 - 4, stream.shape
    np.testing.assert_array_equal(stream, data[: stream.shape[0]])
    assert radio.stats.reacquisitions == 0


@pytest.mark.slow
def test_graded_desync_recovers_from_half_broken_lock():
    """Shift the stream mid-capture by half a symbol WITHOUT a blackout:
    FIB errors go high but not necessarily 100%; the graded EMA trigger
    must reacquire instead of decoding garbage forever."""
    iq = _capture(16)
    iq = apply_impairments(iq, Impairments(snr_db=20, seed=4))
    lo = 6 * 196608 + 999
    broken = np.concatenate([iq[:lo], iq[lo + 1300:]])  # drop 1300 samples
    radio = _run(broken, batch_frames=2)
    assert radio.stats.reacquisitions >= 1
    st = radio.receiver.stats
    ok = st["fibs"] - st["fib_crc_errors"]
    assert ok >= 10 * 12  # decoded fine before AND after the break


@pytest.mark.slow
def test_cfo_ramp_crossing_carrier_holds_lock():
    """Continuous coarse-CFO tracking (VERDICT r2 item #4): a linear
    oscillator walk crossing a full carrier spacing (+1 kHz) must be tracked
    by the fine EMA + whole-carrier folding with ZERO reacquisitions."""
    from tpudab.ofdm.sync import SyncConfig

    n_frames = 64                       # 6.1 s
    ramp = 180.0                        # Hz/s -> +1.1 kHz over the capture
    iq = _capture(n_frames, seed=11)
    iq = apply_impairments(iq, Impairments(freq_offset_hz=400.0,
                                           freq_ramp_hz_per_s=ramp,
                                           snr_db=24, seed=5))
    radio = _run(iq, batch_frames=2,
                 sync_cfg=SyncConfig(fine_freq_beta=0.5))
    st = radio.receiver.stats
    assert radio.stats.reacquisitions == 0, radio.stats
    err_rate = st["fib_crc_errors"] / max(st["fibs"], 1)
    assert err_rate < 0.05, (err_rate, radio.stats)
    # net frequency followed the walk (to within the tracking lag)
    t_end = radio.stats.total_frames * 0.096
    assert abs(radio.stats.net_freq_hz - (400.0 + ramp * t_end)) < 120.0
    # whole carriers were folded out of the fine estimate into coarse
    assert abs(radio.stats.fine_freq_hz) < 1000.0
    assert radio.stats.coarse_freq_hz != 0.0


@pytest.mark.slow
def test_carrier_slip_repaired_without_reacquisition():
    """A +1-carrier (1 kHz) frequency STEP mid-stream is invisible to the
    CP-autocorrelation fine tracker (CFO mod one carrier) and kills every
    FIB — the old loop could only reacquire. The coarse triage must detect
    the integer-bin slip on the PRS and repair in place."""
    n_frames = 20
    iq = _capture(n_frames, seed=12)
    clean = apply_impairments(iq, Impairments(freq_offset_hz=500.0,
                                              snr_db=24, seed=6))
    lo = 8 * 196608
    n = np.arange(clean.shape[0] - lo, dtype=np.float64)
    step = clean.copy()
    step[lo:] *= np.exp(1j * 2 * np.pi * 1000.0 * n / 2.048e6).astype(np.complex64)
    radio = _run(step, batch_frames=2)
    st = radio.receiver.stats
    assert radio.stats.reacquisitions == 0, radio.stats
    assert radio.stats.coarse_adjustments >= 1
    # errors confined to around the step; clean again afterwards
    assert st["fib_crc_errors"] <= 3 * 2 * 12, (st, radio.stats)
    assert abs(radio.stats.net_freq_hz - 1500.0) < 100.0


@pytest.mark.slow
def test_snr_sweep_streaming():
    """Lock and decode across an SNR sweep; at 6 dB the FIC must still be
    essentially clean (rate-1/3 FIC + soft Viterbi margin)."""
    iq = _capture(8)
    for snr in (20.0, 10.0, 6.0):
        noisy = apply_impairments(iq, Impairments(freq_offset_hz=-1500.0,
                                                  snr_db=snr, seed=int(snr)))
        radio = _run(noisy, batch_frames=2)
        st = radio.receiver.stats
        err_rate = st["fib_crc_errors"] / max(st["fibs"], 1)
        assert err_rate < 0.05, (snr, err_rate)
