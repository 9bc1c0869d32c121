"""Viterbi fwd-kernel experiments (round-3 perf push). Run alone on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudab.fec.conv import N_STATES
from tpudab.ops.viterbi import _radix_tables
from tpudab.ops.viterbi_pallas import _pad_to, _fwd_decisions

_NEG = -1e9
_K = 2


def timeit(name, fn, iters=10):
    out = fn()
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<56} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def _fwd_kernel_wide(signs_ref, soft_ref, dec_ref, pm_ref):
    """Variant A: branch metrics for 4 super-steps in ONE MXU matmul.
    soft block: (chunk//4, 8, 4*B_t) — group g, lane-slice q*B_t:(q+1)*B_t
    is super-step 4g+q."""
    n_groups = soft_ref.shape[0]
    b4 = soft_ref.shape[2]
    b_t = b4 // 4

    @pl.when(pl.program_id(1) == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)
        pm_ref[:] = jnp.where(row == 0, 0.0, _NEG).astype(jnp.float32)

    signs = signs_ref[:]  # (256, 8)

    def acs(pm, bm):
        c0 = jnp.repeat(pm[0:16], 4, axis=0) + bm[0:64]
        c1 = jnp.repeat(pm[16:32], 4, axis=0) + bm[64:128]
        c2 = jnp.repeat(pm[32:48], 4, axis=0) + bm[128:192]
        c3 = jnp.repeat(pm[48:64], 4, axis=0) + bm[192:256]
        d01 = (c1 > c0).astype(jnp.int32)
        m01 = jnp.maximum(c0, c1)
        d23 = (c3 > c2).astype(jnp.int32)
        m23 = jnp.maximum(c2, c3)
        dh = m23 > m01
        new_pm = jnp.maximum(m01, m23)
        return new_pm, jnp.where(dh, d23 | 2, d01)

    def group(i, pm):
        bmg = jax.lax.dot_general(
            signs, soft_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (256, 4*B_t)
        acc = None
        for q in range(4):
            pm, dec = acs(pm, bmg[:, q * b_t:(q + 1) * b_t])
            dec = dec << (6 - 2 * q)
            acc = dec if acc is None else acc | dec
        dec_ref[i] = acc.astype(jnp.uint8)
        return pm

    pm = lax.fori_loop(0, n_groups, group, pm_ref[:])
    pm_ref[:] = pm - pm[0:1, :]


def fwd_wide(mother_soft, chunk=32, b_tile=1024):
    assert chunk % 4 == 0
    b0, t0, _ = mother_soft.shape
    soft = _pad_to(mother_soft, _K * 4 * chunk, axis=1, value=1.0)
    soft = _pad_to(soft, b_tile, axis=0, value=0.0)
    b, t, _ = soft.shape
    t2 = t // _K
    n_chunks = t2 // chunk
    n_b = b // b_tile

    signs_np, _ = _radix_tables(_K)
    signs = jnp.asarray(signs_np.T)  # (256, 8)
    # (B, T, 4) -> (T2//4, 8, n_b * 4 * b_tile): batch-tile-major so block j
    # on the lane axis is contiguous; within a block, q-major then batch —
    # soft_t[g, :, (j*4 + q)*b_tile + i] = super-step 4g+q of codeword
    # j*b_tile+i. Verified identical decisions vs the base kernel below.
    soft_t = (soft.reshape(n_b, b_tile, t2 // 4, 4, 4 * _K)
              .transpose(2, 4, 0, 3, 1)
              .reshape(t2 // 4, 4 * _K, n_b * 4 * b_tile)
              .astype(jnp.float32))

    decs = pl.pallas_call(
        _fwd_kernel_wide,
        grid=(n_b, n_chunks),
        in_specs=[
            pl.BlockSpec((256, 4 * _K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk // 4, 4 * _K, 4 * b_tile),
                         lambda j, i: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                               lambda j, i: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t2 // 4, N_STATES, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32)],
    )(signs, soft_t)
    return decs


def main():
    rng = np.random.default_rng(1)
    b, n_bits = 6144, 3456
    t = n_bits + 6
    soft = jnp.asarray(rng.standard_normal((b, t, 4)).astype(np.float32))

    base = jax.jit(lambda s: _fwd_decisions(s, 32, None, False)[0])
    wide = jax.jit(fwd_wide, static_argnames=("chunk", "b_tile"))

    d0 = base(soft)
    d1 = wide(soft)
    d0.block_until_ready(); d1.block_until_ready()
    same = bool(jnp.array_equal(d0[:, :, :b], d1[:, :, :b]))
    print(f"decisions identical: {same}  shapes {d0.shape} {d1.shape}")

    timeit("fwd base (per-step bm matmul)", lambda: base(soft))
    timeit("fwd wide (4-step bm matmul)", lambda: wide(soft))


if __name__ == "__main__":
    main()
