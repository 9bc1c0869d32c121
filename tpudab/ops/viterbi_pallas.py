"""Pallas-TPU Viterbi ACS kernel for the K=7 rate-1/4 DAB mother code.

This is the framework's flagship hand kernel (SURVEY.md sec 2.3 row 2:
"#1 native-kernel target: Pallas ACS kernel"). Design (v2):

- batch on the SUBLANE axis, the 64 trellis states on the LANE axis: every
  per-step op is lane-natural (no sublane shuffles, which Mosaic lowers
  poorly).
- the predecessor "gather" is a one-hot 64x64 MXU matmul:
      cand0 = pm @ G0 + bm[:, :64]     (G0[p, s'] = 1 iff p == s' >> 1)
      cand1 = pm @ G1 + bm[:, 64:]     (G1[p, s'] = 1 iff p == (s'>>1) | 32)
  64x64xB MFLOPs per step are negligible on the MXU; the recursion is
  latency-bound, not FLOP-bound.
- branch metrics for ALL steps are computed outside the kernel by one big
  matmul (soft @ signs^T) and streamed in (chunk, B, 128) blocks; decisions
  stream out as (chunk, B, 64) f32; path metrics persist in VMEM scratch
  across the grid.
- traceback is a cheap reverse XLA scan in the wrapper.

Soft-bit convention as in tpudab.ops.viterbi; codewords padded with the
virtual-flush pattern batch freely.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpudab.fec.conv import OUTPUT_SIGNS, N_STATES

_NEG = -1e9

# one-hot predecessor-selection matrices (static)
_G0 = np.zeros((N_STATES, N_STATES), np.float32)
_G1 = np.zeros((N_STATES, N_STATES), np.float32)
for _s in range(N_STATES):
    _G0[_s >> 1, _s] = 1.0
    _G1[(_s >> 1) | 32, _s] = 1.0


def _acs_kernel(bm_ref, g0_ref, g1_ref, dec_ref, pm_out_ref, pm_scratch):
    """Grid (batch tiles, T chunks); chunk axis fastest. Blocks:
    bm_ref (chunk, B_t, 128), dec_ref (chunk, B_t, 64), pm scratch (B_t, 64).
    """
    import jax.experimental.pallas as pl

    chunk, b_t, _ = bm_ref.shape

    @pl.when(pl.program_id(1) == 0)
    def _():
        pm_scratch[:] = jnp.full((b_t, N_STATES), _NEG, dtype=jnp.float32)
        pm_scratch[:, 0:1] = jnp.zeros((b_t, 1), dtype=jnp.float32)

    g0 = g0_ref[:]
    g1 = g1_ref[:]

    def body(t, pm):
        bm_t = bm_ref[pl.ds(t, 1)][0]  # (B_t, 128)
        cand0 = jax.lax.dot_general(
            pm, g0, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bm_t[:, :N_STATES]
        cand1 = jax.lax.dot_general(
            pm, g1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bm_t[:, N_STATES:]
        dec = cand1 > cand0
        new_pm = jnp.maximum(cand0, cand1)
        dec_ref[pl.ds(t, 1)] = dec.astype(jnp.float32)[None]
        return new_pm

    pm = lax.fori_loop(0, chunk, body, pm_scratch[:])
    # rebase once per chunk (metric spread is bounded by the 6-step
    # reachability diameter, so absolute values stay small)
    pm = pm - pm[:, 0:1]
    pm_scratch[:] = pm
    pm_out_ref[:] = pm


def _pad_to(x, m, axis, value):
    r = x.shape[axis] % m
    if r == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, m - r)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.jit, static_argnames=("n_data_bits", "chunk", "b_tile",
                                             "interpret"))
def viterbi_decode_pallas(mother_soft, n_data_bits: int, chunk: int = 32,
                          b_tile: int = 128, interpret: bool = False):
    """Drop-in equivalent of tpudab.ops.viterbi.viterbi_decode.

    mother_soft: (B, T, 4) float32; returns (B, n_data_bits) uint8.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b0, t0, _ = mother_soft.shape
    soft = _pad_to(mother_soft, chunk, axis=1, value=1.0)  # virtual flush
    soft = _pad_to(soft, b_tile, axis=0, value=0.0)
    b, t, _ = soft.shape
    n_chunks = t // chunk
    n_b = b // b_tile

    # all branch metrics in one MXU matmul, laid out (T, B, 128)
    signs = jnp.asarray(OUTPUT_SIGNS)  # (128, 4)
    bm = jnp.einsum("btc,rc->tbr", soft, signs,
                    preferred_element_type=jnp.float32)

    decs, _ = pl.pallas_call(
        _acs_kernel,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk, b_tile, 128), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATES, N_STATES), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATES, N_STATES), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b_tile, N_STATES), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, N_STATES), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, N_STATES), jnp.float32),
            jax.ShapeDtypeStruct((b, N_STATES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_tile, N_STATES), jnp.float32)],
        interpret=interpret,
    )(bm, jnp.asarray(_G0), jnp.asarray(_G1))

    def traceback(state, dec_step):
        bit = (state & 1).astype(jnp.uint8)
        d = jnp.take_along_axis(dec_step, state[:, None], axis=-1)[:, 0]
        prev = (state >> 1) | (d.astype(jnp.int32) << 5)
        return prev, bit

    final_state = jnp.zeros((b,), dtype=jnp.int32)
    _, bits_rev = lax.scan(traceback, final_state, decs > 0.5,
                           reverse=True, unroll=4)
    bits = jnp.moveaxis(bits_rev, 0, 1)  # (B, T)
    return bits[:b0, :n_data_bits]
