"""Convolutional-code puncturing vectors and protection profiles.

ETSI EN 300 401 sec 11 (convolutional coding, puncturing, UEP/EEP profiles).
Reference parity: vendor/DAB-Radio `dab/constants/subchannel_protection_tables.h`
(proven API via GetUEPDescriptor/CalculateEEPBitrate at
/root/reference/src/render_formatters.cpp:4,20-24) and its depuncturing stage.

Mother code: K=7, rate 1/4, generators (octal) 133, 171, 145, 133; output for
input bit t serialized as (g0,t g1,t g2,t g3,t). Puncturing operates on blocks
of 128 mother bits = 4 repetitions of a 32-entry puncturing vector v_PI; v_PI
has 8 + PI ones. The final 24 tail bits (4 x 6 flush bits) use the 24-entry
tail vector VT with 12 ones.

Vector construction (sec 11.1.2): start from the base vector keeping the first
bit of each group of 4 (the g0 outputs, 8 ones); puncturing index PI adds the
next `PI` bits in the standard's fixed order: second bit of groups
0,4,2,6,1,5,3,7, then third bit of the same group order, then fourth.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

# K=7 mother code generator polynomials, octal 133/171/145/133.
# Bit i of the polynomial taps register bit i (reg bit 0 = newest input).
POLYS = (0o133, 0o171, 0o145, 0o133)
CONSTRAINT = 7
N_STATES = 64
RATE_INV = 4  # mother code outputs per input bit
TAIL_BITS = 6  # flush bits appended to every codeword

_GROUP_ORDER = [0, 4, 2, 6, 1, 5, 3, 7]


@functools.lru_cache(maxsize=None)
def puncture_vector(pi: int) -> np.ndarray:
    """32-entry 0/1 vector with 8 + PI ones (PI in 1..24; PI=24 => all ones)."""
    if not 1 <= pi <= 24:
        raise ValueError(f"puncturing index {pi} out of range 1..24")
    v = np.zeros(32, dtype=np.uint8)
    v[0::4] = 1
    added = 0
    for sub in (1, 2, 3):
        for g in _GROUP_ORDER:
            if added == pi:
                break
            v[4 * g + sub] = 1
            added += 1
    assert int(v.sum()) == 8 + pi
    return v


# Tail puncturing vector VT: keep first two of each group of 4 (12 of 24).
VT = np.tile(np.array([1, 1, 0, 0], dtype=np.uint8), 6)


@dataclasses.dataclass(frozen=True)
class PunctureProfile:
    """A sequence of (count, PI) runs over 128-bit mother blocks, plus tail.

    `runs` covers exactly (I + TAIL_BITS - TAIL_BITS)/32 = I/32 blocks where I
    is the number of data input bits; the 24 tail mother bits are always
    punctured with VT.
    """

    runs: tuple  # ((n_blocks, PI), ...)

    @property
    def total_blocks(self) -> int:
        return sum(n for n, _ in self.runs)

    @property
    def data_bits(self) -> int:
        """Convolutional input data bits I covered by this profile."""
        return self.total_blocks * 32

    @property
    def punctured_bits(self) -> int:
        """Output bits after puncturing (including 12 surviving tail bits)."""
        return sum(n * 4 * (8 + pi) for n, pi in self.runs) + int(VT.sum())

    def mask(self) -> np.ndarray:
        """Full 0/1 keep-mask over the 4*(I+6) mother output bits."""
        parts = []
        for n, pi in self.runs:
            parts.append(np.tile(puncture_vector(pi), 4 * n))
        parts.append(VT)
        return np.concatenate(parts)


# FIC protection (sec 11.2): 768-bit FIB groups -> 2304 punctured bits.
FIC_PROFILE = PunctureProfile(runs=((21, 16), (3, 15)))
# Mode III FIC: 1024-bit groups (4 FIBs) -> 3072 punctured bits.
# 32 blocks: x*(8+PI1)*4 + y*(8+PI2)*4 + 12 = 3072 with x+y=32 -> PI=16/15, y=3.
FIC_PROFILE_MODE3 = PunctureProfile(runs=((29, 16), (3, 15)))


def eep_profile(size_cu: int, protection_level: int, option: int) -> PunctureProfile:
    """EEP profile for a subchannel (EN 300 401 sec 11.3.2).

    option 0 = set A (bitrate 8n kbps), option 1 = set B (bitrate 32n kbps).
    protection_level in 1..4 (called 1-A..4-A / 1-B..4-B).
    """
    if option == 0:
        # set A: subchannel sizes 12n/8n/6n/4n CU for levels 1..4
        cu_per_n = {1: 12, 2: 8, 3: 6, 4: 4}[protection_level]
        if size_cu % cu_per_n:
            raise ValueError(f"EEP {protection_level}-A size {size_cu} CU not multiple of {cu_per_n}")
        n = size_cu // cu_per_n
        if protection_level == 1:
            runs = ((6 * n - 3, 24), (3, 23))
        elif protection_level == 2:
            if n == 1:
                runs = ((5, 13), (1, 12))
            else:
                runs = ((2 * n - 3, 14), (4 * n + 3, 13))
        elif protection_level == 3:
            runs = ((6 * n - 3, 8), (3, 7))
        else:
            runs = ((4 * n - 3, 3), (2 * n + 3, 2))
    elif option == 1:
        # set B: subchannel sizes 27n/21n/18n/15n CU for levels 1..4
        cu_per_n = {1: 27, 2: 21, 3: 18, 4: 15}[protection_level]
        if size_cu % cu_per_n:
            raise ValueError(f"EEP {protection_level}-B size {size_cu} CU not multiple of {cu_per_n}")
        n = size_cu // cu_per_n
        pi = {1: (10, 9), 2: (6, 5), 3: (4, 3), 4: (2, 1)}[protection_level]
        runs = ((24 * n - 3, pi[0]), (3, pi[1]))
    else:
        raise ValueError(f"EEP option {option} not in (0, 1)")
    prof = PunctureProfile(runs=tuple((int(a), int(b)) for a, b in runs))
    assert prof.punctured_bits == size_cu * 64, (
        f"EEP profile mismatch: {prof.punctured_bits} != {size_cu * 64}")
    return prof


def eep_bitrate_kbps(size_cu: int, protection_level: int, option: int) -> int:
    """Reference-parity `CalculateEEPBitrate` (render_formatters.cpp:20-24)."""
    if option == 0:
        cu_per_n = {1: 12, 2: 8, 3: 6, 4: 4}[protection_level]
        return size_cu // cu_per_n * 8
    cu_per_n = {1: 27, 2: 21, 3: 18, 4: 15}[protection_level]
    return size_cu // cu_per_n * 32


def eep_data_bits(size_cu: int, protection_level: int, option: int) -> int:
    """Convolutional input bits I per logical frame (24 ms)."""
    return eep_bitrate_kbps(size_cu, protection_level, option) * 24


# ---------------------------------------------------------------------------
# UEP (unequal error protection) for classic DAB audio, EN 300 401 sec 11.3.1
# (the per-bitrate protection-profile tables).
#
# Provenance (offline build, no ETSI text available — VERDICT r2 item #2):
# each row was transcribed TWICE, independently (round-1 recollection of the
# qt-dab lineage; round-3 recollection of the welle.io/standard lineage), and
# every candidate is filtered by the EXACT bit-budget identity
#     sum(Li * 4 * (8 + PIi)) + 12 + padding == size_cu * 64
# with the size_cu column externally fixture-verified (HIGH). The identity is
# a strong filter: a single-digit error in any L or PI almost always breaks
# it. Per-row confidence tag (surfaced via uep_row_confidence):
#   'a' = both transcriptions identical AND budget-exact        (19 rows)
#   'r' = second transcription budget-exact (pad 0/4)           (28 rows)
#   'p' = second transcription, requires 8 padding bits         ( 7 rows)
#   's' = minimal budget-exact perturbation of the recollection (10 rows)
# 's' rows are the residual real-broadcast risk: region boundaries may be
# off by a few blocks (elevated BER on those bitrate/level combinations
# only). The synthesizer shares this table, so round trips stay exact.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class UEPProfile:
    bitrate_kbps: int
    protection_level: int  # 1..5 (1 = strongest)
    size_cu: int
    l: tuple               # 4 region lengths in 128-bit mother blocks
    pi: tuple              # 4 puncturing indices
    padding_bits: int = 0  # bits appended after tail to fill the subchannel

    @property
    def data_bits(self) -> int:
        return self.bitrate_kbps * 24

    def to_profile(self) -> PunctureProfile:
        runs = tuple((int(n), int(p)) for n, p in zip(self.l, self.pi) if n > 0)
        return PunctureProfile(runs=runs)

    def consistent(self) -> bool:
        prof = self.to_profile()
        return (prof.data_bits == self.data_bits
                and prof.punctured_bits + self.padding_bits == self.size_cu * 64)


# (bitrate, level, size_cu, (L1..L4), (PI1..PI4), padding, confidence)
# Region lengths L are in 128-bit mother blocks; total blocks = bitrate*24/32.
_UEP_ROWS = [
    (32, 1, 35, (3, 5, 13, 3), (24, 17, 12, 17), 4, 'r'),
    (32, 2, 29, (3, 4, 14, 3), (22, 13, 8, 13), 0, 'r'),
    (32, 3, 24, (3, 4, 14, 3), (16, 8, 6, 8), 4, 'r'),
    (32, 4, 21, (3, 3, 18, 0), (11, 6, 5, 0), 0, 'a'),
    (32, 5, 16, (3, 4, 17, 0), (5, 3, 2, 0), 0, 'a'),
    (48, 1, 52, (3, 5, 25, 3), (24, 18, 13, 18), 0, 'r'),
    (48, 2, 42, (3, 4, 26, 3), (24, 14, 8, 15), 0, 'r'),
    (48, 3, 35, (3, 4, 26, 3), (15, 10, 6, 9), 4, 'a'),
    (48, 4, 29, (3, 4, 26, 3), (9, 6, 4, 6), 0, 'a'),
    (48, 5, 24, (4, 3, 26, 3), (5, 4, 2, 3), 0, 'a'),
    (56, 2, 52, (6, 10, 23, 3), (23, 13, 8, 13), 8, 'p'),
    (56, 3, 42, (6, 12, 21, 3), (16, 7, 6, 9), 0, 'r'),
    (56, 4, 35, (6, 10, 23, 3), (9, 6, 4, 5), 0, 'a'),
    (56, 5, 29, (6, 10, 23, 3), (5, 4, 2, 3), 0, 'a'),
    (64, 1, 70, (6, 11, 28, 3), (24, 18, 12, 18), 4, 'r'),
    (64, 2, 58, (6, 10, 29, 3), (23, 13, 8, 13), 8, 'p'),
    (64, 3, 48, (6, 12, 27, 3), (16, 8, 6, 9), 0, 'r'),
    (64, 4, 42, (6, 9, 33, 0), (11, 6, 5, 0), 0, 'r'),
    (64, 5, 32, (6, 9, 31, 2), (5, 3, 2, 3), 0, 'a'),
    (80, 1, 84, (6, 10, 41, 3), (24, 17, 12, 18), 4, 'r'),
    (80, 2, 70, (6, 10, 41, 3), (23, 13, 8, 13), 8, 'p'),
    (80, 3, 58, (6, 11, 40, 3), (16, 8, 6, 7), 0, 'r'),
    (80, 4, 52, (6, 10, 41, 3), (11, 6, 5, 6), 0, 'r'),
    (80, 5, 40, (6, 10, 41, 3), (6, 3, 2, 3), 0, 'a'),
    (96, 1, 104, (6, 13, 50, 3), (24, 18, 13, 19), 0, 's'),
    (96, 2, 84, (6, 10, 53, 3), (22, 12, 9, 12), 0, 'r'),
    (96, 3, 70, (6, 12, 51, 3), (16, 9, 6, 10), 4, 'r'),
    (96, 4, 58, (7, 10, 52, 3), (9, 6, 4, 6), 0, 'a'),
    (96, 5, 48, (7, 9, 53, 3), (5, 4, 2, 4), 0, 'a'),
    (112, 2, 104, (11, 21, 49, 3), (23, 12, 9, 14), 4, 'r'),
    (112, 3, 84, (11, 23, 47, 3), (16, 8, 6, 9), 0, 'r'),
    (112, 4, 70, (11, 21, 49, 3), (9, 6, 4, 8), 0, 'a'),
    (112, 5, 58, (14, 17, 50, 3), (5, 4, 2, 5), 0, 'a'),
    (128, 1, 140, (11, 20, 62, 3), (24, 17, 13, 19), 8, 'p'),
    (128, 2, 116, (11, 29, 53, 3), (22, 13, 8, 14), 0, 's'),
    (128, 3, 96, (11, 23, 59, 3), (16, 9, 6, 9), 4, 's'),
    (128, 4, 84, (11, 21, 61, 3), (11, 6, 5, 7), 0, 'r'),
    (128, 5, 64, (12, 19, 62, 3), (5, 3, 2, 4), 0, 'a'),
    (160, 1, 168, (11, 22, 84, 3), (24, 18, 12, 19), 0, 'a'),
    (160, 2, 140, (11, 29, 77, 3), (22, 13, 8, 14), 0, 's'),
    (160, 3, 116, (11, 24, 82, 3), (16, 8, 6, 11), 0, 'r'),
    (160, 4, 104, (11, 23, 83, 3), (11, 6, 5, 9), 0, 'r'),
    (160, 5, 80, (11, 19, 87, 3), (5, 4, 2, 4), 0, 'a'),
    (192, 1, 208, (11, 21, 109, 3), (24, 20, 13, 24), 0, 'a'),
    (192, 2, 168, (11, 20, 110, 3), (22, 13, 9, 13), 8, 's'),
    (192, 3, 140, (11, 24, 106, 3), (16, 10, 6, 11), 0, 's'),
    (192, 4, 116, (11, 22, 108, 3), (10, 6, 4, 9), 0, 'r'),
    (192, 5, 96, (11, 20, 110, 3), (6, 4, 2, 5), 0, 'a'),
    (224, 1, 232, (11, 24, 130, 3), (24, 20, 12, 20), 4, 'r'),
    (224, 2, 208, (12, 28, 125, 3), (24, 14, 10, 17), 0, 's'),
    (224, 3, 168, (11, 25, 129, 3), (16, 9, 7, 12), 4, 's'),
    (224, 4, 140, (11, 28, 126, 3), (12, 8, 4, 11), 0, 's'),
    (224, 5, 116, (12, 22, 131, 3), (8, 6, 2, 6), 4, 'r'),
    (256, 1, 280, (11, 26, 152, 3), (24, 19, 14, 18), 4, 'r'),
    (256, 2, 232, (11, 22, 156, 3), (24, 14, 10, 13), 8, 'p'),
    (256, 3, 192, (11, 27, 151, 3), (16, 10, 7, 10), 0, 'r'),
    (256, 4, 168, (11, 24, 154, 3), (12, 9, 5, 10), 4, 'r'),
    (256, 5, 128, (11, 24, 154, 3), (6, 5, 2, 5), 0, 'a'),
    (320, 2, 280, (11, 26, 200, 3), (24, 17, 9, 17), 0, 'r'),
    (320, 4, 208, (11, 25, 201, 3), (13, 9, 5, 10), 8, 'p'),
    (320, 5, 160, (11, 26, 200, 3), (8, 5, 2, 6), 4, 's'),
    (384, 1, 416, (12, 28, 245, 3), (24, 20, 14, 23), 8, 'p'),
    (384, 3, 280, (11, 24, 250, 3), (16, 9, 7, 10), 4, 'r'),
    (384, 5, 192, (11, 27, 247, 3), (8, 6, 2, 7), 0, 'r'),
]


def _build_uep_table():
    """Validate every row against the exact bit budget at import time."""
    out = {}
    for (br, pl, size, l, pi, pad, conf) in _UEP_ROWS:
        prof = UEPProfile(br, pl, size, l, pi, pad)
        assert prof.consistent(), (br, pl)
        out[(br, pl)] = (prof, conf)
    return out


_UEP_TABLE = _build_uep_table()


def uep_row_confidence(bitrate_kbps: int, protection_level: int) -> str:
    """Per-row provenance tag: 'a' dual-transcription exact, 'r' single
    transcription exact, 'p' transcription + 8-bit padding assumption,
    's' budget-solved reconstruction (see table comment above)."""
    return _UEP_TABLE[(bitrate_kbps, protection_level)][1]



def get_uep_profile(bitrate_kbps: int, protection_level: int) -> UEPProfile:
    try:
        return _UEP_TABLE[(bitrate_kbps, protection_level)][0]
    except KeyError:
        raise ValueError(
            f"no UEP profile for bitrate {bitrate_kbps} kbps, level {protection_level}")


def uep_descriptor(size_cu: int, table_index: int = None, *,
                   bitrate_kbps: int = None, protection_level: int = None):
    """Reference-parity `GetUEPDescriptor` lookup by subchannel size."""
    if bitrate_kbps is not None and protection_level is not None:
        return get_uep_profile(bitrate_kbps, protection_level)
    matches = [p for (p, _) in _UEP_TABLE.values() if p.size_cu == size_cu]
    if not matches:
        raise ValueError(f"no UEP profile with size {size_cu} CU")
    return matches[0]


def uep_index_order():
    """UEP table keys (bitrate, level) in STANDARD row order.

    EN 300 401 orders the 64-row sub-channel table by bitrate ascending and,
    within a bitrate, by protection level DESCENDING (PL5 weakest first):
    index 0 = 32 kbps PL5 (16 CU) ... index 63 = 384 kbps PL1 (416 CU).
    Externally cross-checked against the size-by-index table reproduced in
    public DAB decoders (tests/test_tables_external.py). FIG 0/1 short form
    transmits this index, so the ordering is broadcast-facing.
    """
    return sorted(_UEP_TABLE.keys(), key=lambda k: (k[0], -k[1]))


def get_uep_index_table():
    """(bitrate, level) -> 0-based table index in standard row order."""
    return {k: i for i, k in enumerate(uep_index_order())}


def get_uep_profile_by_index(table_index: int) -> UEPProfile:
    """FIG 0/1 short-form table index -> UEP profile."""
    keys = uep_index_order()
    if not 0 <= table_index < len(keys):
        raise ValueError(f"UEP table index {table_index} out of range")
    return _UEP_TABLE[keys[table_index]][0]
