"""Constants layer: numerology, PRS, interleaver, puncturing self-consistency."""

import numpy as np
import pytest

from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE
from tpudab.constants.dab_params import get_dab_params, CIF_BITS
from tpudab.constants import prs, interleaver
from tpudab.constants.puncture import (
    FIC_PROFILE, FIC_PROFILE_MODE3, eep_profile, eep_bitrate_kbps,
    puncture_vector, VT, get_uep_profile, _UEP_TABLE,
)


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_ofdm_numerology(mode):
    p = get_ofdm_params(mode)
    assert p.nb_null_period + p.nb_symbols * p.nb_symbol_period == p.nb_frame_length
    assert p.nb_data_carriers % 32 == 0


def test_mode1_headline_numbers():
    p = get_ofdm_params(1)
    assert p.nb_frame_length == 196_608
    assert p.nb_frame_bits == 230_400
    assert p.nb_frame_length / SAMPLING_RATE == 0.096
    d = get_dab_params(1)
    assert d.nb_fic_bits == 9216
    assert d.nb_msc_bits == 4 * CIF_BITS
    assert d.nb_fibs == 12


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_dab_params_consistency(mode):
    d = get_dab_params(mode)
    assert d.nb_fic_bits + d.nb_cifs * CIF_BITS == d.nb_frame_bits


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_prs_covers_all_carriers(mode):
    p = get_ofdm_params(mode)
    phases = prs.get_prs_phases(mode)
    assert phases.shape == (p.nb_data_carriers,)
    assert set(np.unique(phases)) <= {0, 1, 2, 3}
    vals = prs.get_prs_carriers(mode)
    np.testing.assert_allclose(np.abs(vals), 1.0, rtol=1e-6)


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_prs_spectrum_layout(mode):
    p = get_ofdm_params(mode)
    spec = prs.get_prs_spectrum(mode)
    assert spec.shape == (p.nb_fft,)
    assert spec[0] == 0  # DC unused
    active = np.abs(spec) > 0
    assert active.sum() == p.nb_data_carriers


@pytest.mark.parametrize("mode", [1, 2, 3, 4])
def test_interleaver_is_bijection(mode):
    p = get_ofdm_params(mode)
    pos = interleaver.get_carrier_map_positions(mode)
    assert sorted(pos.tolist()) == list(range(p.nb_data_carriers))
    inv = interleaver.get_inverse_map_positions(mode)
    np.testing.assert_array_equal(inv[pos], np.arange(p.nb_data_carriers))


def test_mode1_interleaver_known_structure():
    kmap = interleaver.get_carrier_map(1)
    assert kmap.min() == -768 and kmap.max() == 768
    assert 0 not in kmap


def test_puncture_vectors():
    for pi in range(1, 25):
        v = puncture_vector(pi)
        assert v.sum() == 8 + pi
        assert np.all(v[0::4] == 1)
    assert VT.sum() == 12
    assert np.all(puncture_vector(24) == 1)


def test_fic_profile_geometry():
    assert FIC_PROFILE.data_bits == 768
    assert FIC_PROFILE.punctured_bits == 2304
    assert FIC_PROFILE.mask().shape[0] == 4 * (768 + 6)
    assert FIC_PROFILE_MODE3.data_bits == 1024
    assert FIC_PROFILE_MODE3.punctured_bits == 3072


@pytest.mark.parametrize("level,option,size", [
    (1, 0, 12), (1, 0, 48), (2, 0, 8), (2, 0, 32), (3, 0, 6), (3, 0, 288),
    (4, 0, 4), (4, 0, 96), (1, 1, 27), (2, 1, 42), (3, 1, 36), (4, 1, 60),
])
def test_eep_profiles(level, option, size):
    prof = eep_profile(size, level, option)
    assert prof.punctured_bits == size * 64
    br = eep_bitrate_kbps(size, level, option)
    assert prof.data_bits == br * 24


def test_uep_table_self_consistent():
    # every surviving row must satisfy the bit-budget identity
    for (br, pl), (prof, verified) in _UEP_TABLE.items():
        assert prof.consistent(), (br, pl)
        assert prof.data_bits == br * 24
    # the common broadcast configurations must be present
    for key in [(128, 3), (192, 3), (160, 3), (96, 3), (224, 3), (64, 3)]:
        get_uep_profile(*key)
