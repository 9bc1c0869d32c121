"""Transmission modes II/III/IV: numerology, FIC geometry, OFDM round trips,
and full FIC chain (the reference hardcodes mode I at the plugin level but
ofdm_core/dab_core support all modes — SURVEY.md sec 2.2)."""

import numpy as np
import pytest

from tpudab.constants.dab_params import get_dab_params
from tpudab.synth import EnsembleSpec, ServiceSpec, SubchannelSpec, EnsembleSynthesizer, ASCTY_DAB_PLUS
from tpudab.synth.modulator import modulate_frame_bits, Impairments, apply_impairments
from tpudab.ofdm.sync import acquire
from tpudab.ofdm.demod import demod_frames
from tpudab.fic.fib import decode_fic_frame
from tpudab.fic.fig_parser import parse_fib
from tpudab.database.updater import DatabaseUpdater
from tpudab.utils.bits import bits_to_soft


def _spec(mode):
    return EnsembleSpec(
        ensemble_id=0x5000 + mode, label=f"Mode {mode} Mux",
        services=[ServiceSpec(0xC300, "SvcM", [(0, ASCTY_DAB_PLUS, 1)])],
        subchannels=[SubchannelSpec(1, start_cu=0, size_cu=36,
                                    protection=("eep", 3, 0))])


@pytest.mark.parametrize("mode", [2, 3, 4])
def test_fic_chain_direct(mode):
    synth = EnsembleSynthesizer(_spec(mode), mode=mode, seed=mode)
    bits = synth.frame_bits(0)
    dab = get_dab_params(mode)
    soft = bits_to_soft(bits[: dab.nb_fic_bits])
    fibs, ok = decode_fic_frame(soft, mode)
    assert fibs.shape == (dab.nb_fibs, 32)
    assert ok.all()
    upd = DatabaseUpdater()
    for fib in fibs:
        upd.process_events(parse_fib(fib))
    assert upd.db.ensemble.ensemble_id == 0x5000 + mode


@pytest.mark.parametrize("mode", [2, 4])
def test_acquire_and_demod_other_modes(mode):
    synth = EnsembleSynthesizer(_spec(mode), mode=mode, seed=10 + mode)
    frames_bits = [synth.frame_bits(i) for i in range(2)]
    iq = np.concatenate([modulate_frame_bits(b, mode) for b in frames_bits] * 3)
    iq = apply_impairments(iq, Impairments(freq_offset_hz=9_000.0,
                                           delay_samples=123, snr_db=18, seed=1))
    res = acquire(iq, mode)
    assert res["frame_start"] == 123
    assert abs(res["net_freq_hz"] - 9_000.0) < 200
    from tpudab.constants.ofdm_params import get_ofdm_params
    p = get_ofdm_params(mode)
    aligned = iq[res["frame_start"] : res["frame_start"] + p.nb_frame_length]
    soft, _ = demod_frames(aligned[None], res["net_freq_hz"], mode)
    hard = (np.asarray(soft)[0] < 0).astype(np.uint8)
    assert (hard != frames_bits[0]).mean() < 0.01


# ---------------------------------------------------------------------------
# Modes II-IV through the FULL device path (VERDICT r2 item #5): the jitted
# ReceiveStep, the sharded multi-chip step, and the streaming loop — not just
# the host-side FIC chain.
# ---------------------------------------------------------------------------

def _payload_capture(mode, n_frames, seed):
    """Synth capture with a known payload on an EEP 3-A subchannel."""
    from tpudab.synth.modulator import modulate_frame_bits as mod
    spec = _spec(mode)
    synth = EnsembleSynthesizer(spec, mode=mode, seed=seed)
    dab = get_dab_params(mode)
    n_logical = n_frames * dab.nb_cifs
    rng = np.random.default_rng(1000 + seed)
    data = rng.integers(0, 256, (n_logical, 48 * 3)).astype(np.uint8)
    synth.payload_fn[1] = lambda m: data[m].tobytes()
    frames = np.stack([mod(synth.frame_bits(i), mode)
                       for i in range(n_frames)])
    return frames, data


def _subch_cfg():
    from tpudab.constants.puncture import eep_profile
    from tpudab.msc.subchannel import SubchannelConfig
    return SubchannelConfig(subch_id=1, start_cu=0, size_cu=36,
                            profile=eep_profile(36, 3, 0))


@pytest.mark.parametrize("mode", [2, 3, 4])
def test_receive_step_modes(mode):
    """Jitted device ReceiveStep end-to-end per mode: FIC CRC-clean (incl.
    the mode III 4-FIB group profile) and MSC payload bit-exact."""
    from tpudab.models.step import ReceiveStep
    from tpudab.fec.crc import check_fib_crc

    dab = get_dab_params(mode)
    n_frames = -(-20 // dab.nb_cifs)          # >= 20 logical frames
    frames, payload = _payload_capture(mode, n_frames, seed=30 + mode)
    step = ReceiveStep(mode=mode, subchannels=(_subch_cfg(),))
    re = np.ascontiguousarray(frames.real, np.float32)
    im = np.ascontiguousarray(frames.imag, np.float32)
    carry, out = step(step.init_carry(), re, im, np.float32(0.0))

    fibs = np.asarray(out["fic_bytes"]).reshape(-1, 32)
    assert fibs.shape[0] == n_frames * dab.nb_fibs
    assert check_fib_crc(fibs).all()
    got = np.asarray(out["subch"][1])[15:]
    np.testing.assert_array_equal(got, payload[: got.shape[0]])


@pytest.mark.slow
@pytest.mark.parametrize("mode", [2, 4])
def test_sharded_step_modes(mode):
    """ShardedReceiveStep halo exchange per mode: mode II has 1 CIF/frame
    (15 frames of halo history per shard), mode IV has 2."""
    import jax
    from tpudab.parallel.mesh import make_mesh
    from tpudab.parallel.sharded_step import ShardedReceiveStep
    from tpudab.fec.crc import check_fib_crc

    dab = get_dab_params(mode)
    t_shard = -(-15 // dab.nb_cifs)
    t_total = 2 * t_shard
    frames, payload = _payload_capture(mode, t_total, seed=40 + mode)
    mesh = make_mesh(2, shape=(1, 2), devices=jax.devices()[:2])
    step = ShardedReceiveStep(mesh, mode=mode, subchannels=(_subch_cfg(),))
    fr, fi, fq = step.shard_inputs(frames[None], np.zeros(1, np.float32))
    carry, out = step(step.init_carry(1), fr, fi, fq)

    assert check_fib_crc(np.asarray(out["fic_bytes"]).reshape(-1, 32)).all()
    got = np.asarray(out["subch"][1])[0, 15:]
    np.testing.assert_array_equal(got, payload[: got.shape[0]])


@pytest.mark.slow
@pytest.mark.parametrize("mode", [2, 3, 4])
def test_streaming_modes(mode):
    """StreamingRadio (acquire + track + decode loop) per mode under CFO,
    delay and noise."""
    from tpudab.host.streaming import StreamingRadio

    dab = get_dab_params(mode)
    n_frames = -(-24 // dab.nb_cifs)
    frames, _ = _payload_capture(mode, n_frames, seed=50 + mode)
    iq = apply_impairments(frames.reshape(-1),
                           Impairments(freq_offset_hz=700.0, snr_db=20,
                                       delay_samples=400, seed=mode))
    pos = {"i": 0}

    def source(n):
        lo = pos["i"]
        pos["i"] = min(lo + n, iq.shape[0])
        return iq[lo:pos["i"]]

    radio = StreamingRadio(source, mode=mode, batch_frames=4)
    radio.run()
    st = radio.receiver.stats
    assert radio.stats.total_frames >= n_frames - 6
    err_rate = st["fib_crc_errors"] / max(st["fibs"], 1)
    assert err_rate < 0.1, (mode, err_rate, radio.stats)
    assert radio.receiver.db.ensemble.label == f"Mode {mode} Mux"


@pytest.mark.slow
@pytest.mark.parametrize("mode", [2, 4])
def test_streaming_device_step_modes(mode):
    """The live loop's production device path (fused ReceiveStep) per
    non-default mode: the step must build mid-stream from FIC discovery
    and decode CRC-clean under CFO + noise (r4: streaming device step)."""
    from tpudab.host.streaming import StreamingRadio

    dab = get_dab_params(mode)
    n_frames = -(-24 // dab.nb_cifs)
    frames, _ = _payload_capture(mode, n_frames, seed=60 + mode)
    iq = apply_impairments(frames.reshape(-1),
                           Impairments(freq_offset_hz=500.0, snr_db=22,
                                       delay_samples=300, seed=mode))
    pos = {"i": 0}

    def source(n):
        lo = pos["i"]
        pos["i"] = min(lo + n, iq.shape[0])
        return iq[lo:pos["i"]]

    radio = StreamingRadio(source, mode=mode, batch_frames=4,
                           use_device_step=True)
    radio.run()
    assert radio._driver.step is not None       # device path really ran
    st = radio.receiver.stats
    err_rate = st["fib_crc_errors"] / max(st["fibs"], 1)
    assert err_rate < 0.1, (mode, err_rate, radio.stats)
    assert radio.receiver.db.ensemble.label == f"Mode {mode} Mux"
