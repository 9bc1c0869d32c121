"""Batched soft-decision Viterbi decoder for the K=7 rate-1/4 DAB mother code.

TPU-native replacement for the reference's vendored SIMD `viterbi_decoder`
package (/root/reference/CMakeLists.txt:53-54; SURVEY.md sec 2.3 row 2 calls
this the #1 native-kernel target). Design rationale (SURVEY.md sec 7):
the 64-state trellis is sequential in time, so per-chip throughput comes from
*batching across codewords* (FIB groups x subchannels x CIFs x ensembles),
not from parallelizing one trellis:

- Branch metrics for ALL steps are one big matmul (B*T, 4) @ (4, 128) onto
  the MXU: metric[reg7] = sum_j soft_j * sign_j(reg7).
- The ACS recursion is a lax.scan over time with only static gathers
  (predecessor tables), max, and add — pure VPU work, fully batched over B.
- Traceback is a reverse scan over stored 1-bit decisions.

Codewords of different lengths batch together by right-padding with the
"virtual flush" pattern (+A on all four mother bits): since the encoder ends
in state 0 and u=0 keeps state 0 with all-zero output bits, appending
all-(+A) steps extends every path's metric by the same maximum amount along
the true path and strictly less along wrong paths, so the argmax is unchanged
(pad_mother_soft).

Soft-bit convention: +1 => bit 0, -1 => bit 1, 0 => erasure (depunctured).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpudab.fec.conv import OUTPUT_SIGNS, N_STATES

_NEG = -1e9


def pad_mother_soft(mother_soft: np.ndarray, target_steps: int,
                    amplitude: float = 1.0) -> np.ndarray:
    """Right-pad (..., T, 4) mother soft bits to (..., target_steps, 4).

    Padding uses +amplitude on all four generator outputs == perfect evidence
    for a continued zero-input flush; exact w.r.t. the decoded prefix.
    """
    t = mother_soft.shape[-2]
    if t == target_steps:
        return mother_soft
    pad = np.zeros(mother_soft.shape[:-2] + (target_steps - t, 4), dtype=mother_soft.dtype)
    pad += amplitude
    return np.concatenate([mother_soft, pad], axis=-2)


@functools.partial(jax.jit, static_argnames=("n_data_bits",))
def viterbi_decode(mother_soft, n_data_bits: int):
    """Decode batched codewords.

    Args:
      mother_soft: (B, T, 4) float32 depunctured mother-code soft bits
        (T = n_data_bits + 6 + optional virtual-flush padding).
      n_data_bits: number of data bits to return (tail/padding dropped).

    Returns:
      bits: (B, n_data_bits) uint8 hard decisions.
    """
    signs_t = jnp.asarray(OUTPUT_SIGNS.T)  # (4, 128)
    pred0 = jnp.asarray((np.arange(N_STATES) >> 1).astype(np.int32))
    pred1 = jnp.asarray(((np.arange(N_STATES) >> 1) | 32).astype(np.int32))
    shifts64 = jnp.asarray(np.concatenate([np.arange(32, dtype=np.uint32)] * 2))

    b, t, _ = mother_soft.shape
    soft_t = jnp.moveaxis(mother_soft, 1, 0)  # (T, B, 4)

    pm0 = jnp.full((b, N_STATES), _NEG, dtype=jnp.float32).at[:, 0].set(0.0)

    # Branch metrics are computed INSIDE the scan body (a skinny per-step
    # matmul): precomputing all of them would materialize a (T, B, 128) f32
    # tensor — tens of GB of HBM traffic at production batch sizes, which
    # dominates the whole decode. Decisions are bit-packed to 2 uint32 words
    # per codeword per step (64x smaller than a bool (T, B, 64) buffer).
    def acs(pm, soft_step):
        bm = jax.lax.dot_general(
            soft_step, signs_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (B, 128)
        cand0 = jnp.take(pm, pred0, axis=-1) + bm[:, :N_STATES]
        cand1 = jnp.take(pm, pred1, axis=-1) + bm[:, N_STATES:]
        dec = (cand1 > cand0)
        new_pm = jnp.maximum(cand0, cand1)
        # rebase on state 0's metric: the metric SPREAD is bounded by the
        # trellis (<= reachability diameter * max branch metric), so this
        # keeps absolute values bounded without a cross-state reduction
        new_pm = new_pm - new_pm[:, 0:1]
        bits = dec.astype(jnp.uint32) << shifts64[None, :]
        lo = bits[:, :32].sum(axis=-1, dtype=jnp.uint32)
        hi = bits[:, 32:].sum(axis=-1, dtype=jnp.uint32)
        return new_pm, (lo, hi)

    _, (dec_lo, dec_hi) = lax.scan(acs, pm0, soft_t, unroll=4)  # (T, B) u32

    def traceback(state, dec_step):
        lo, hi = dec_step
        bit = (state & 1).astype(jnp.uint8)
        word = jnp.where(state < 32, lo, hi)
        d = (word >> (state.astype(jnp.uint32) & 31)) & 1
        prev = (state >> 1) | (d.astype(jnp.int32) << 5)
        return prev, bit

    final_state = jnp.zeros((b,), dtype=jnp.int32)
    _, bits_rev = lax.scan(traceback, final_state, (dec_lo, dec_hi),
                           reverse=True, unroll=4)
    # scan(reverse=True) emits outputs in forward order: bits_rev[t] is the
    # bit decoded at step t.
    bits = jnp.moveaxis(bits_rev, 0, 1)  # (B, T)
    return bits[:, :n_data_bits]


def viterbi_decode_np(mother_soft: np.ndarray, n_data_bits: int) -> np.ndarray:
    """NumPy oracle (identical algorithm) for unit tests."""
    mother_soft = np.asarray(mother_soft, dtype=np.float32)
    if mother_soft.ndim == 2:
        mother_soft = mother_soft[None]
        squeeze = True
    else:
        squeeze = False
    b, t, _ = mother_soft.shape
    bm = mother_soft @ OUTPUT_SIGNS.T  # (B, T, 128)
    pred0 = (np.arange(N_STATES) >> 1)
    pred1 = pred0 | 32
    pm = np.full((b, N_STATES), _NEG, dtype=np.float32)
    pm[:, 0] = 0.0
    decs = np.zeros((t, b, N_STATES), dtype=bool)
    for i in range(t):
        cand0 = pm[:, pred0] + bm[:, i, :N_STATES]
        cand1 = pm[:, pred1] + bm[:, i, N_STATES:]
        decs[i] = cand1 > cand0
        pm = np.maximum(cand0, cand1)
        pm -= pm[:, 0:1]
    state = np.zeros(b, dtype=np.int64)
    bits = np.zeros((b, t), dtype=np.uint8)
    for i in range(t - 1, -1, -1):
        bits[:, i] = state & 1
        d = decs[i][np.arange(b), state]
        state = (state >> 1) | (d.astype(np.int64) << 5)
    out = bits[:, :n_data_bits]
    return out[0] if squeeze else out
