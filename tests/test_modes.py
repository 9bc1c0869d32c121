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
