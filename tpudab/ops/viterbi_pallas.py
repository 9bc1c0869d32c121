"""Pallas-TPU Viterbi ACS kernel for the K=7 rate-1/4 DAB mother code.

This is the framework's flagship hand kernel (SURVEY.md sec 2.3 row 2:
"#1 native-kernel target: Pallas ACS kernel"; sec 7 roofline item). The
XLA-scan implementation (tpudab.ops.viterbi) pays per-step scan overhead;
here the whole trellis runs inside one kernel with:

- states on the sublane axis (64), batch on the lane axis (multiples of 128)
- the ACS butterfly expressed with pure reshapes/slices — NO gathers:
    pm viewed as (2, 32, B): pm2[b5][r] are the two predecessors of
    s' = 2r+u, and the branch metrics viewed as (2, 32, 2, B) give
    bm[b6][r][u]; new_pm (32, 2, B) row-major == state order 2r+u.
- branch metrics for a whole T-chunk computed by ONE MXU matmul per chunk:
    signs (128, 4) @ soft (4, CHUNK*B)
- decisions streamed to HBM as f32 (one value per state/step/batch element);
  traceback is a cheap reverse XLA scan on the host-side wrapper.

Layout contract: mother soft bits arranged (4, T, B) f32 with B % 128 == 0
and T % chunk == 0 (pad with pad_mother_soft's virtual flush first).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpudab.fec.conv import OUTPUT_SIGNS, N_STATES

_NEG = -1e9


def _acs_kernel(soft_ref, signs_ref, dec_ref, pm_out_ref, pm_scratch, bm_scratch):
    """Grid over T chunks. soft_ref block: (4, CHUNK, B); dec block
    (CHUNK, 64, B) f32; pm carried in scratch (64, B); bm staged in scratch
    (128, CHUNK, B) because Mosaic has no dynamic_slice on values."""
    import jax.experimental.pallas as pl

    chunk = soft_ref.shape[1]
    b = soft_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        pm_scratch[:] = jnp.full((N_STATES, b), _NEG, dtype=jnp.float32)
        pm_scratch[0:1, :] = jnp.zeros((1, b), dtype=jnp.float32)

    # all branch metrics for the chunk: (128, CHUNK*B) on the MXU
    soft_flat = soft_ref[:].reshape(4, chunk * b)
    bm_scratch[:] = jax.lax.dot_general(
        signs_ref[:], soft_flat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(128, chunk, b)

    def body(t, pm):
        bm_t = bm_scratch[:, pl.ds(t, 1), :][:, 0, :]   # (128, B)
        # bm index reg7 = b6*64 + s' = b6*64 + 2r + u -> (b6, r, u) major
        bm4 = bm_t.reshape(2, 32, 2, b)             # [b6][r][u]
        pm2 = pm.reshape(2, 32, b)                  # [b5][r]
        cand0 = pm2[0][:, None, :] + bm4[0]         # (32, 2, B)
        cand1 = pm2[1][:, None, :] + bm4[1]
        dec = (cand1 > cand0)
        new_pm = jnp.maximum(cand0, cand1).reshape(N_STATES, b)
        dec_ref[pl.ds(t, 1)] = dec.reshape(1, N_STATES, b).astype(jnp.float32)
        return new_pm

    pm = pm_scratch[:]
    pm = lax.fori_loop(0, chunk, body, pm)
    # normalize once per chunk to keep absolute magnitudes small
    pm = pm - jnp.max(pm, axis=0, keepdims=True)
    pm_scratch[:] = pm
    pm_out_ref[:] = pm


def _pad_to(x, m, axis, value):
    r = x.shape[axis] % m
    if r == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, m - r)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.jit, static_argnames=("n_data_bits", "chunk", "interpret"))
def viterbi_decode_pallas(mother_soft, n_data_bits: int, chunk: int = 64,
                          interpret: bool = False):
    """Drop-in equivalent of tpudab.ops.viterbi.viterbi_decode.

    mother_soft: (B, T, 4) float32; returns (B, n_data_bits) uint8.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b0, t0, _ = mother_soft.shape
    # arrange (4, T, B), pad B to 128 lanes and T to chunk multiple with the
    # virtual-flush pattern (+1 on all four outputs keeps state 0 optimal)
    soft = jnp.moveaxis(mother_soft, (0, 1, 2), (2, 1, 0))  # (4, T, B)
    soft = _pad_to(soft, chunk, axis=1, value=1.0)
    soft = _pad_to(soft, 128, axis=2, value=0.0)
    _, t, b = soft.shape
    n_chunks = t // chunk

    signs = jnp.asarray(OUTPUT_SIGNS)  # (128, 4)

    # grid: (batch tiles of 128 lanes, T chunks); chunk axis iterates fastest
    # so the pm scratch carries within one batch tile and reinitializes at
    # chunk 0 of the next.
    b_tile = 128
    n_b = b // b_tile

    decs, _ = pl.pallas_call(
        _acs_kernel,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((4, chunk, b_tile), lambda j, i: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 4), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, N_STATES, b_tile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATES, b_tile), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, N_STATES, b), jnp.float32),
            jax.ShapeDtypeStruct((N_STATES, b), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32),
                        pltpu.VMEM((128, chunk, b_tile), jnp.float32)],
        interpret=interpret,
    )(soft, signs)

    # traceback (XLA reverse scan, cheap): state bit order here is the
    # natural s' = 2r+u indexing, identical to the scan decoder's
    def traceback(state, dec_step):
        # dec_step: (64, B) -> per-element decision at current state
        bit = (state & 1).astype(jnp.uint8)
        d = jnp.take_along_axis(dec_step.T, state[:, None], axis=-1)[:, 0]
        prev = (state >> 1) | (d.astype(jnp.int32) << 5)
        return prev, bit

    final_state = jnp.zeros((b,), dtype=jnp.int32)
    dec_bool = decs > 0.5
    _, bits_rev = lax.scan(traceback, final_state, dec_bool, reverse=True)
    bits = jnp.moveaxis(bits_rev, 0, 1)  # (B, T)
    return bits[:b0, :n_data_bits]
