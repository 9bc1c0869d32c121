"""Externally-derived fixtures for the reconstructed standards tables.

VERDICT round-1 item #2: every table test elsewhere round-trips through
tpudab/synth, which is built FROM the same tables — a wrong table would pass.
The fixtures in this file are written down independently of the tpudab
source: they are literal transcriptions of the standards tables as reproduced
in public DAB receiver implementations (welle.io phasetable / dablin
pad_decoder / qt-dab protection tables lineages), re-keyed by hand here, and
structural identities stated directly by EN 300 401's text. They never import
tpudab.synth and never call the encoders under test.

Confidence per table is documented in tpudab/constants/provenance.py.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# UEP: EN 300 401 Table 8 — 64 rows ordered by bitrate ASC, protection level
# DESC (PL5 weakest first). FIG 0/1 short form transmits the row index, so
# ordering is broadcast-facing. Sizes (CU) transcribed from the table as
# reproduced across public decoders.
# ---------------------------------------------------------------------------

UEP_SIZES_BY_INDEX = [
    16, 21, 24, 29, 35,           # 32 kbps, PL 5..1
    24, 29, 35, 42, 52,           # 48 kbps, PL 5..1
    29, 35, 42, 52,               # 56 kbps, PL 5..2
    32, 42, 48, 58, 70,           # 64 kbps, PL 5..1
    40, 52, 58, 70, 84,           # 80 kbps, PL 5..1
    48, 58, 70, 84, 104,          # 96 kbps, PL 5..1
    58, 70, 84, 104,              # 112 kbps, PL 5..2
    64, 84, 96, 116, 140,         # 128 kbps, PL 5..1
    80, 104, 116, 140, 168,       # 160 kbps, PL 5..1
    96, 116, 140, 168, 208,       # 192 kbps, PL 5..1
    116, 140, 168, 208, 232,      # 224 kbps, PL 5..1
    128, 168, 192, 232, 280,      # 256 kbps, PL 5..1
    160, 208, 280,                # 320 kbps, PL 5, 4, 2
    192, 280, 416,                # 384 kbps, PL 5, 3, 1
]

UEP_ROWS_BY_INDEX = (
    [(32, pl) for pl in (5, 4, 3, 2, 1)]
    + [(48, pl) for pl in (5, 4, 3, 2, 1)]
    + [(56, pl) for pl in (5, 4, 3, 2)]
    + [(64, pl) for pl in (5, 4, 3, 2, 1)]
    + [(80, pl) for pl in (5, 4, 3, 2, 1)]
    + [(96, pl) for pl in (5, 4, 3, 2, 1)]
    + [(112, pl) for pl in (5, 4, 3, 2)]
    + [(128, pl) for pl in (5, 4, 3, 2, 1)]
    + [(160, pl) for pl in (5, 4, 3, 2, 1)]
    + [(192, pl) for pl in (5, 4, 3, 2, 1)]
    + [(224, pl) for pl in (5, 4, 3, 2, 1)]
    + [(256, pl) for pl in (5, 4, 3, 2, 1)]
    + [(320, 5), (320, 4), (320, 2)]
    + [(384, 5), (384, 3), (384, 1)]
)


def test_uep_index_table_matches_standard_ordering():
    from tpudab.constants.puncture import (uep_index_order, _UEP_TABLE,
                                           get_uep_profile_by_index)
    order = uep_index_order()
    assert len(order) == 64 == len(UEP_SIZES_BY_INDEX)
    for idx, ((br, pl), size) in enumerate(
            zip(UEP_ROWS_BY_INDEX, UEP_SIZES_BY_INDEX)):
        assert order[idx] == (br, pl), (idx, order[idx], (br, pl))
        prof = get_uep_profile_by_index(idx)
        assert prof.size_cu == size, (idx, br, pl, prof.size_cu, size)
        assert prof.bitrate_kbps == br and prof.protection_level == pl


def test_uep_regions_satisfy_bit_budget_identity():
    """Every row's punctured output exactly fills size_cu * 64 bits (with its
    declared padding) and decodes bitrate*24 data bits — no more solved-at-
    import rows (VERDICT r2 item #2)."""
    from tpudab.constants.puncture import _UEP_TABLE
    for (br, pl), (prof, conf) in _UEP_TABLE.items():
        assert prof.consistent(), (br, pl)
        assert prof.data_bits == br * 24
        assert conf in "arps"


# ---------------------------------------------------------------------------
# UEP region splits (L1..L4, PI1..PI4): second transcription, written down
# here from the qt-dab/welle.io UEP-table lineage WITHOUT consulting the
# tpudab source, then filtered by the exact bit-budget identity. Rows absent
# from this dict are the ones where the transcription failed the budget and
# the production table carries a budget-solved reconstruction instead
# (tagged 's' — see tpudab/constants/puncture.py provenance comment).
# ---------------------------------------------------------------------------

UEP_REGIONS_SECOND_LINEAGE = {
    (32, 5): ((3, 4, 17, 0), (5, 3, 2, 0)),
    (32, 4): ((3, 3, 18, 0), (11, 6, 5, 0)),
    (32, 3): ((3, 4, 14, 3), (16, 8, 6, 8)),
    (32, 2): ((3, 4, 14, 3), (22, 13, 8, 13)),
    (32, 1): ((3, 5, 13, 3), (24, 17, 12, 17)),
    (48, 5): ((4, 3, 26, 3), (5, 4, 2, 3)),
    (48, 4): ((3, 4, 26, 3), (9, 6, 4, 6)),
    (48, 3): ((3, 4, 26, 3), (15, 10, 6, 9)),
    (48, 2): ((3, 4, 26, 3), (24, 14, 8, 15)),
    (48, 1): ((3, 5, 25, 3), (24, 18, 13, 18)),
    (56, 5): ((6, 10, 23, 3), (5, 4, 2, 3)),
    (56, 4): ((6, 10, 23, 3), (9, 6, 4, 5)),
    (56, 3): ((6, 12, 21, 3), (16, 7, 6, 9)),
    (56, 2): ((6, 10, 23, 3), (23, 13, 8, 13)),
    (64, 5): ((6, 9, 31, 2), (5, 3, 2, 3)),
    (64, 4): ((6, 9, 33, 0), (11, 6, 5, 0)),
    (64, 3): ((6, 12, 27, 3), (16, 8, 6, 9)),
    (64, 2): ((6, 10, 29, 3), (23, 13, 8, 13)),
    (64, 1): ((6, 11, 28, 3), (24, 18, 12, 18)),
    (80, 5): ((6, 10, 41, 3), (6, 3, 2, 3)),
    (80, 4): ((6, 10, 41, 3), (11, 6, 5, 6)),
    (80, 3): ((6, 11, 40, 3), (16, 8, 6, 7)),
    (80, 2): ((6, 10, 41, 3), (23, 13, 8, 13)),
    (80, 1): ((6, 10, 41, 3), (24, 17, 12, 18)),
    (96, 5): ((7, 9, 53, 3), (5, 4, 2, 4)),
    (96, 4): ((7, 10, 52, 3), (9, 6, 4, 6)),
    (96, 3): ((6, 12, 51, 3), (16, 9, 6, 10)),
    (96, 2): ((6, 10, 53, 3), (22, 12, 9, 12)),
    (112, 5): ((14, 17, 50, 3), (5, 4, 2, 5)),
    (112, 4): ((11, 21, 49, 3), (9, 6, 4, 8)),
    (112, 3): ((11, 23, 47, 3), (16, 8, 6, 9)),
    (112, 2): ((11, 21, 49, 3), (23, 12, 9, 14)),
    (128, 5): ((12, 19, 62, 3), (5, 3, 2, 4)),
    (128, 4): ((11, 21, 61, 3), (11, 6, 5, 7)),
    (128, 1): ((11, 20, 62, 3), (24, 17, 13, 19)),
    (160, 5): ((11, 19, 87, 3), (5, 4, 2, 4)),
    (160, 4): ((11, 23, 83, 3), (11, 6, 5, 9)),
    (160, 3): ((11, 24, 82, 3), (16, 8, 6, 11)),
    (160, 1): ((11, 22, 84, 3), (24, 18, 12, 19)),
    (192, 5): ((11, 20, 110, 3), (6, 4, 2, 5)),
    (192, 4): ((11, 22, 108, 3), (10, 6, 4, 9)),
    (192, 1): ((11, 21, 109, 3), (24, 20, 13, 24)),
    (224, 5): ((12, 22, 131, 3), (8, 6, 2, 6)),
    (224, 1): ((11, 24, 130, 3), (24, 20, 12, 20)),
    (256, 5): ((11, 24, 154, 3), (6, 5, 2, 5)),
    (256, 4): ((11, 24, 154, 3), (12, 9, 5, 10)),
    (256, 3): ((11, 27, 151, 3), (16, 10, 7, 10)),
    (256, 2): ((11, 22, 156, 3), (24, 14, 10, 13)),
    (256, 1): ((11, 26, 152, 3), (24, 19, 14, 18)),
    (320, 5): None,   # transcription failed the budget (pad 28) — solved row
    (320, 4): ((11, 25, 201, 3), (13, 9, 5, 10)),
    (320, 2): ((11, 26, 200, 3), (24, 17, 9, 17)),
    (384, 5): ((11, 27, 247, 3), (8, 6, 2, 7)),
    (384, 3): ((11, 24, 250, 3), (16, 9, 7, 10)),
    (384, 1): ((12, 28, 245, 3), (24, 20, 14, 23)),
}


def test_uep_regions_match_second_lineage():
    """Production rows must equal the independent transcription wherever the
    transcription is budget-valid; solved rows ('s') must be flagged."""
    from tpudab.constants.puncture import _UEP_TABLE, uep_row_confidence

    checked = 0
    for key, fix in UEP_REGIONS_SECOND_LINEAGE.items():
        if fix is None:
            assert uep_row_confidence(*key) == "s"
            continue
        prof, conf = _UEP_TABLE[key]
        assert tuple(prof.l) == fix[0], (key, prof.l, fix[0])
        assert tuple(p if l else 0 for l, p in zip(prof.l, prof.pi)) \
            == fix[1], (key, prof.pi, fix[1])
        assert conf in "arp", key
        checked += 1
    assert checked >= 54
    # every row NOT covered by the transcription is explicitly tagged solved
    for key, (prof, conf) in _UEP_TABLE.items():
        if key not in UEP_REGIONS_SECOND_LINEAGE:
            assert conf == "s", key


def test_uep_index_roundtrip_database_entities():
    """FIG 0/1 index -> database entity bitrate must follow standard order."""
    from tpudab.database.entities import Subchannel
    sub = Subchannel(subch_id=1, start_cu=0, size_cu=16, is_uep=True,
                     uep_index=0)
    assert sub.bitrate_kbps == 32       # index 0 = 32 kbps PL5, 16 CU
    sub63 = Subchannel(subch_id=1, start_cu=0, size_cu=416, is_uep=True,
                       uep_index=63)
    assert sub63.bitrate_kbps == 384    # index 63 = 384 kbps PL1, 416 CU


# ---------------------------------------------------------------------------
# Puncturing vectors: EN 300 401 sec 11.1.2 Tables 29/30. The vectors follow
# the base-plus-bit-reversed-group-order construction; fixture rows written
# out bit-by-bit per the table.
# ---------------------------------------------------------------------------

PUNCTURE_FIXTURES = {
    # PI=1: base g0 columns + second bit of group 0
    1: "11001000100010001000100010001000",
    # PI=2: + second bit of group 4
    2: "11001000100010001100100010001000",
    # PI=3: + second bit of group 2
    3: "11001000110010001100100010001000",
    # PI=8: second bit of all 8 groups
    8: "11001100110011001100110011001100",
    # PI=16: second+third bit of all groups
    16: "11101110111011101110111011101110",
    # PI=24: all bits kept (mother rate 1/4)
    24: "11111111111111111111111111111111",
}

TAIL_VECTOR = "110011001100110011001100"


def test_puncture_vectors_match_standard_rows():
    from tpudab.constants.puncture import puncture_vector, VT
    for pi, bits in PUNCTURE_FIXTURES.items():
        want = np.array([int(c) for c in bits], np.uint8)
        np.testing.assert_array_equal(puncture_vector(pi), want, err_msg=str(pi))
    np.testing.assert_array_equal(
        VT, np.array([int(c) for c in TAIL_VECTOR], np.uint8))
    # all 24 vectors: 8+PI ones, nested (v_PI ones are a superset of v_PI-1)
    prev = np.zeros(32, np.uint8)
    for pi in range(1, 25):
        v = puncture_vector(pi)
        assert int(v.sum()) == 8 + pi
        assert np.all(v >= prev)
        prev = v


def test_fic_profile_is_21x16_3x15():
    """FIC convolutional profile (EN 300 401 sec 11.2): PI=16 for the first
    21 blocks, PI=15 for the last 3, tail VT -> 2304 bits / 768-bit group."""
    from tpudab.constants.puncture import FIC_PROFILE
    assert FIC_PROFILE.runs == ((21, 16), (3, 15))
    assert FIC_PROFILE.punctured_bits == 2304


def test_eep_profiles_match_standard_formulas():
    """EEP (sec 11.3.2): run lengths/PIs are closed-form in n; fixture rows
    written from the standard's formulas, not the repo's."""
    from tpudab.constants.puncture import eep_profile
    # (size_cu, level, option) -> expected runs
    cases = {
        (12, 1, 0): ((3, 24), (3, 23)),      # 1-A n=1
        (48, 1, 0): ((21, 24), (3, 23)),     # 1-A n=4
        (8, 2, 0): ((5, 13), (1, 12)),       # 2-A n=1 special case
        (32, 2, 0): ((5, 14), (19, 13)),     # 2-A n=4
        (36, 3, 0): ((33, 8), (3, 7)),       # 3-A n=6
        (16, 4, 0): ((13, 3), (11, 2)),      # 4-A n=4
        (27, 1, 1): ((21, 10), (3, 9)),      # 1-B n=1
        (42, 2, 1): ((45, 6), (3, 5)),       # 2-B n=2
        (54, 3, 1): ((69, 4), (3, 3)),       # 3-B n=3
        (30, 4, 1): ((45, 2), (3, 1)),       # 4-B n=2
    }
    for (size, lvl, opt), runs in cases.items():
        assert eep_profile(size, lvl, opt).runs == runs, (size, lvl, opt)


# ---------------------------------------------------------------------------
# PRS: EN 300 401 sec 14.3.2. h table (Table 43) and the full transmission
# mode I block table (Table 44) transcribed from the public phase-reference
# tables (welle.io/dablin lineage); phases recomputed here from the fixture
# and compared to the production generator.
# ---------------------------------------------------------------------------

H_FIXTURE = [
    [0, 2, 0, 0, 0, 0, 1, 1, 2, 0, 0, 0, 2, 2, 1, 1,
     0, 2, 0, 0, 0, 0, 1, 1, 2, 0, 0, 0, 2, 2, 1, 1],
    [0, 3, 2, 3, 0, 1, 3, 0, 2, 1, 2, 3, 2, 3, 3, 0,
     0, 3, 2, 3, 0, 1, 3, 0, 2, 1, 2, 3, 2, 3, 3, 0],
    [0, 0, 0, 2, 0, 2, 1, 3, 2, 2, 0, 2, 2, 0, 1, 3,
     0, 0, 0, 2, 0, 2, 1, 3, 2, 2, 0, 2, 2, 0, 1, 3],
    [0, 1, 2, 1, 0, 3, 3, 2, 2, 3, 2, 1, 2, 1, 3, 2,
     0, 1, 2, 1, 0, 3, 3, 2, 2, 3, 2, 1, 2, 1, 3, 2],
]

# Mode I Table 44: (k', i, n) for 48 blocks of 32 carriers.
MODE1_BLOCKS = [
    (-768, 0, 1), (-736, 1, 2), (-704, 2, 0), (-672, 3, 1),
    (-640, 0, 3), (-608, 1, 2), (-576, 2, 2), (-544, 3, 3),
    (-512, 0, 2), (-480, 1, 1), (-448, 2, 2), (-416, 3, 3),
    (-384, 0, 1), (-352, 1, 2), (-320, 2, 3), (-288, 3, 3),
    (-256, 0, 2), (-224, 1, 2), (-192, 2, 2), (-160, 3, 1),
    (-128, 0, 1), (-96, 1, 3), (-64, 2, 1), (-32, 3, 2),
    (1, 0, 3), (33, 3, 1), (65, 2, 1), (97, 1, 1),
    (129, 0, 2), (161, 3, 2), (193, 2, 1), (225, 1, 0),
    (257, 0, 2), (289, 3, 2), (321, 2, 3), (353, 1, 3),
    (385, 0, 0), (417, 3, 2), (449, 2, 1), (481, 1, 3),
    (513, 0, 3), (545, 3, 3), (577, 2, 3), (609, 1, 0),
    (641, 0, 3), (673, 3, 0), (705, 2, 1), (737, 1, 1),
]


def test_prs_h_table_matches_fixture():
    from tpudab.constants.prs import H_TABLE
    np.testing.assert_array_equal(H_TABLE, np.array(H_FIXTURE))


def test_prs_mode1_phases_match_fixture():
    """Recompute phi_k for every mode I carrier from the fixture tables only
    and compare against the production generator."""
    from tpudab.constants.prs import get_prs_phases
    h = np.array(H_FIXTURE)
    phases = {}
    for (kp, i, n) in MODE1_BLOCKS:
        for k in range(kp, kp + 32):
            if k == 0:
                continue
            phases[k] = (h[i, k - kp] + n) % 4
    ks = [k for k in range(-768, 769) if k != 0]
    want = np.array([phases[k] for k in ks])
    np.testing.assert_array_equal(get_prs_phases(1), want)


@pytest.mark.parametrize("mode,k_half", [(1, 768), (2, 192), (3, 96), (4, 384)])
def test_prs_structural_invariants(mode, k_half):
    """All modes: full carrier coverage, QPSK phase alphabet, and k'=-k_half
    block alignment (blocks of 32). Modes I and IV follow the i cycles
    0,1,2,3 (negative) / 0,3,2,1 (positive); modes II and III have their own
    i patterns (see MODE*_BLOCKS fixtures below)."""
    from tpudab.constants.prs import get_prs_phases, _blocks_for_mode
    ph = get_prs_phases(mode)
    assert ph.shape == (2 * k_half,)
    assert set(np.unique(ph)) <= {0, 1, 2, 3}
    blocks = _blocks_for_mode(mode)
    assert len(blocks) == 2 * k_half // 32
    neg = [b for b in blocks if b[0] < 0]
    pos = [b for b in blocks if b[0] > 0]
    if mode in (1, 4):
        assert [b[3] for b in neg] == [j % 4 for j in range(len(neg))]
        assert [b[3] for b in pos] == [(0, 3, 2, 1)[j % 4]
                                       for j in range(len(pos))]
    assert neg[0][0] == -k_half and pos[0][0] == 1
    covered = sorted(k for (kmin, kmax, _, _, _) in blocks
                     for k in range(kmin, kmax + 1) if k != 0)
    assert covered == [k for k in range(-k_half, k_half + 1) if k != 0]


# Modes II-IV block tables (k', i, n), welle.io phase-table lineage — the
# same lineage whose mode-I rows (MODE1_BLOCKS above) match the externally
# verified mode-I table bit-for-bit, calibrating the transcription.
MODE2_BLOCKS = [
    (-192, 0, 2), (-160, 1, 3), (-128, 2, 2), (-96, 3, 2), (-64, 0, 1),
    (-32, 1, 2),
    (1, 2, 0), (33, 1, 2), (65, 0, 2), (97, 3, 1), (129, 2, 0), (161, 1, 3),
]
MODE3_BLOCKS = [
    (-96, 0, 2), (-64, 1, 3), (-32, 2, 0),
    (1, 3, 2), (33, 2, 2), (65, 1, 2),
]
MODE4_BLOCKS = [
    (-384, 0, 0), (-352, 1, 1), (-320, 2, 1), (-288, 3, 2), (-256, 0, 2),
    (-224, 1, 2), (-192, 2, 0), (-160, 3, 3), (-128, 0, 3), (-96, 1, 1),
    (-64, 2, 3), (-32, 3, 2),
    (1, 0, 0), (33, 3, 1), (65, 2, 0), (97, 1, 2), (129, 0, 0), (161, 3, 1),
    (193, 2, 2), (225, 1, 2), (257, 0, 2), (289, 3, 1), (321, 2, 3),
    (353, 1, 0),
]


@pytest.mark.parametrize("mode,blocks,k_half",
                         [(2, MODE2_BLOCKS, 192), (3, MODE3_BLOCKS, 96),
                          (4, MODE4_BLOCKS, 384)])
def test_prs_mode234_phases_match_fixture(mode, blocks, k_half):
    """Recompute phi_k from the fixture tables only, compare to production."""
    from tpudab.constants.prs import get_prs_phases
    h = np.array(H_FIXTURE)
    phases = {}
    for (kp, i, n) in blocks:
        for k in range(kp, kp + 32):
            if k == 0 or abs(k) > k_half:
                continue
            phases[k] = (h[i, k - kp] + n) % 4
    ks = [k for k in range(-k_half, k_half + 1) if k != 0]
    want = np.array([phases[k] for k in ks])
    np.testing.assert_array_equal(get_prs_phases(mode), want)


def test_prs_low_papr_design_property():
    """Independent structural validation of the (i, n) tables: EN 300 401's
    TFPR was chosen for a low-PAPR time-domain reference. With the correct
    tables the PRS PAPR sits near 5-7 for every mode; shuffling the n values
    raises it to ~9-14 (measured). A mis-transcribed table reads as random
    here — this catches digit errors the coverage checks cannot."""
    from tpudab.constants.prs import get_prs_time, get_prs_spectrum

    rng = np.random.default_rng(0)
    for mode in (1, 2, 3, 4):
        t = get_prs_time(mode)
        papr = float(np.max(np.abs(t) ** 2) / np.mean(np.abs(t) ** 2))
        assert papr < 7.5, (mode, papr)
        # baseline: same spectrum magnitude, scrambled per-block phases
        spec = get_prs_spectrum(mode)
        worse = 0
        for _ in range(10):
            ph = np.exp(1j * (np.pi / 2) * rng.integers(
                0, 4, spec.shape[0] // 32).repeat(32))
            s2 = spec * ph[: spec.shape[0]]
            t2 = np.fft.ifft(s2)
            papr2 = float(np.max(np.abs(t2) ** 2) / np.mean(np.abs(t2) ** 2))
            worse += papr2 > papr
        assert worse >= 7, (mode, papr, worse)


# ---------------------------------------------------------------------------
# X-PAD / dynamic label: hand-assembled byte fixtures per EN 300 401 sec 7.4,
# with an independent bit-by-bit CRC16 (poly 0x1021, init all-ones,
# transmitted complemented — sec 5.2.1), never calling the tpudab encoders.
# ---------------------------------------------------------------------------

def _crc16_independent(data: bytes) -> int:
    reg = 0xFFFF
    for byte in data:
        for bit in range(7, -1, -1):
            inbit = (byte >> bit) & 1
            fb = ((reg >> 15) & 1) ^ inbit
            reg = ((reg << 1) & 0xFFFF)
            if fb:
                reg ^= 0x1021
    return reg ^ 0xFFFF


def _dl_segment(text: bytes, *, toggle: int, first: int, last: int,
                seg_num: int = 0, charset: int = 0) -> bytes:
    b0 = (toggle << 7) | (first << 6) | (last << 5) | (0 << 4) | (len(text) - 1)
    b1 = (charset << 4) if first else (seg_num << 4)
    body = bytes([b0, b1]) + text
    crc = _crc16_independent(body)
    return body + bytes([crc >> 8, crc & 0xFF])


def test_crc16_convention_matches():
    """The independent CRC must agree with the production engine (validates
    the init/complement convention, not just internal consistency)."""
    from tpudab.fec.crc import crc16_ccitt
    for blob in (b"", b"\x00", b"123456789", bytes(range(30))):
        assert _crc16_independent(blob) == int(
            crc16_ccitt(np.frombuffer(blob, np.uint8)))


def test_dynamic_label_from_hand_built_segments():
    from tpudab.pad.xpad import DynamicLabelDecoder
    dec = DynamicLabelDecoder()
    dec.push_segment(_dl_segment(b"Now Playing: The", toggle=0, first=1,
                                 last=0, charset=0)[:])
    assert dec.label == ""  # incomplete
    dec.push_segment(_dl_segment(b" Blue Danube", toggle=0, first=0, last=1,
                                 seg_num=1))
    assert dec.label == "Now Playing: The Blue Danube"
    assert dec.charset == 0
    # charset rides the HIGH nibble of the second prefix byte
    dec2 = DynamicLabelDecoder()
    dec2.push_segment(_dl_segment("café".encode("utf-8"), toggle=1,
                                  first=1, last=1, charset=15))
    assert dec2.charset == 15
    assert dec2.label == "café"


def test_xpad_stream_hand_built():
    """Full variable-size X-PAD subfield walk: CI list (dl start, len 8) then
    data, hand-packed. CI byte = length-index(3 bits) | app type(5 bits);
    length code 2 -> 8 bytes. F-PAD: X-PAD Ind=2 (variable) in byte0 bits
    5-4, CI flag in byte1 bit 1."""
    from tpudab.pad.xpad import XPADProcessor
    seg = _dl_segment(b"HELLO", toggle=0, first=1, last=1, charset=0)
    assert len(seg) == 9
    ci_dl_start = (2 << 5) | 2   # 8 bytes, app type 2
    ci_dl_cont = (0 << 5) | 3    # 4 bytes, app type 3
    # CI list terminated by an app-type-0 end marker (fewer than 4 CIs)
    xpad1 = (bytes([ci_dl_start, ci_dl_cont, 0x00])
             + seg[:8] + seg[8:] + b"\x00" * 3)
    fpad_ci = bytes([0x20, 0x02])    # xpad_ind=2, ci flag set
    proc = XPADProcessor()
    proc.push(fpad_ci, xpad1)
    assert proc.dynamic_label.label == "HELLO"
