"""K=7 rate-1/4 mother convolutional code: encoder and static trellis tables.

EN 300 401 sec 11.1: generators G1 = 1+x^2+x^3+x^5+x^6 (0o133),
G2 = 1+x+x^2+x^3+x^6 (0o171), G3 = 1+x+x^4+x^6 (0o145), G4 = G1 (0o133).

Conventions used throughout the framework:
- encoder register bit k holds input bit u_{t-k} (bit 0 = newest)
- state s (6 bits): s bit j = u_{t-1-j}
- transition id reg7 = (s << 1) | u_t, so new state s' = reg7 & 63 and
  predecessor state = reg7 >> 1
- the two predecessors of s' are (s' >> 1) and (s' >> 1) | 32, reached with
  transition ids s' and s' | 64 respectively

These tables are consumed by tpudab.ops.viterbi (the ACS kernels) and by the
synthesizer's encoder.
"""

from __future__ import annotations

import numpy as np

from tpudab.constants.puncture import TAIL_BITS

# Tap masks with bit k = tap on u_{t-k} (time-reversed octal polys).
# G1 taps {0,2,3,5,6} -> 0b1101101; G2 {0,1,2,3,6} -> 0b1001111;
# G3 {0,1,4,6} -> 0b1010011; G4 = G1.
TAP_MASKS = np.array([0b1101101, 0b1001111, 0b1010011, 0b1101101], dtype=np.int64)
N_STATES = 64
N_TRANSITIONS = 128


def _popcount_parity(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    p = np.zeros_like(x)
    while np.any(x):
        p ^= x & 1
        x >>= 1
    return p


# OUTPUT_BITS[reg7, j] = output bit of generator j for transition reg7.
_reg7 = np.arange(N_TRANSITIONS, dtype=np.int64)
OUTPUT_BITS = _popcount_parity(_reg7[:, None] & TAP_MASKS[None, :]).astype(np.uint8)
# OUTPUT_SIGNS[reg7, j] = 1 - 2*bit, for correlation branch metrics.
OUTPUT_SIGNS = (1.0 - 2.0 * OUTPUT_BITS).astype(np.float32)

# Predecessor index tables for the ACS butterfly.
_sprime = np.arange(N_STATES, dtype=np.int64)
PRED0 = _sprime >> 1            # transition id = s'
PRED1 = (_sprime >> 1) | 32     # transition id = s' | 64


def conv_encode(bits: np.ndarray) -> np.ndarray:
    """Encode data bits -> mother code output of length 4*(len+6).

    Appends TAIL_BITS zero flush bits. Output serialized per input bit:
    (g1,t g2,t g3,t g4,t ...). Host NumPy (used by the synthesizer fixture).
    """
    bits = np.asarray(bits, dtype=np.uint8).ravel()
    padded = np.concatenate([bits, np.zeros(TAIL_BITS, dtype=np.uint8)])
    n = padded.shape[0]
    # reg7 at step t = sum_k u_{t-k} << k
    reg7 = np.zeros(n, dtype=np.int64)
    for k in range(7):
        shifted = np.zeros(n, dtype=np.int64)
        shifted[k:] = padded[: n - k]
        reg7 |= shifted << k
    return OUTPUT_BITS[reg7].reshape(-1)
