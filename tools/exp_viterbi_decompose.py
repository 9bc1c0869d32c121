"""Decompose the Pallas Viterbi forward kernel's time at production shape
(VERDICT r4 'Next round' item 4, step 1: "measure the bound").

Variants (all same grid/blocks as production _fwd_kernel):
  full     - production kernel (bm matmul + ACS + decision pack + store)
  nodec    - bm matmul + ACS chain, NO decision compute/pack (store zeros
             once per chunk): isolates the decision-extract + pack + store
  noacs    - bm matmul + decision-shaped store derived from bm alone, no
             sequential pm recursion: isolates the ACS dependency chain
  bmonly   - bm matmuls only, single tiny store: isolates the MXU feed
  tbonly   - traceback kernel on precomputed decisions
  e2e      - viterbi_decode_pallas_bytes (fwd + tb + glue)

Timing: queue N dispatches, ONE device-side reduce + scalar fetch (the
axon tunnel makes per-call sync meaningless; see .claude/skills/verify).

Run: python tools/exp_viterbi_decompose.py [iters]
"""

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
from tpudab.ops.viterbi_pallas import (_fwd_kernel, _fwd_decisions,
                                       viterbi_decode_pallas_bytes, _NEG, _K)

B, NBITS = 6144, 3456
CHUNK = 32


def _variant_kernel(do_acs: bool, do_dec: bool, do_bm: bool):
    def kernel(signs_ref, soft_ref, dec_ref, pm_ref):
        chunk = soft_ref.shape[0]
        b_t = soft_ref.shape[2]

        @pl.when(pl.program_id(1) == 0)
        def _():
            row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)
            pm_ref[:] = jnp.where(row == 0, 0.0, _NEG).astype(jnp.float32)

        signs = signs_ref[:]

        def acs(pm, soft_t):
            if do_bm:
                bm = jax.lax.dot_general(
                    signs, soft_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                # scalar-dependent stand-in (Mosaic cannot broadcast a
                # 1-sublane slice to 256 sublanes)
                bm = jax.lax.broadcasted_iota(
                    jnp.int32, (256, b_t), 0).astype(jnp.float32) * soft_t[0, 0]
            if not do_acs:
                # decision-shaped value from bm alone (no recursion)
                d = (bm[0:64] > bm[64:128]).astype(jnp.int32)
                return pm, d
            c0 = jnp.repeat(pm[0:16], 4, axis=0) + bm[0:64]
            c1 = jnp.repeat(pm[16:32], 4, axis=0) + bm[64:128]
            c2 = jnp.repeat(pm[32:48], 4, axis=0) + bm[128:192]
            c3 = jnp.repeat(pm[48:64], 4, axis=0) + bm[192:256]
            if do_dec:
                d01 = (c1 > c0).astype(jnp.int32)
                m01 = jnp.maximum(c0, c1)
                d23 = (c3 > c2).astype(jnp.int32)
                m23 = jnp.maximum(c2, c3)
                dh = m23 > m01
                new_pm = jnp.maximum(m01, m23)
                return new_pm, jnp.where(dh, d23 | 2, d01)
            new_pm = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
            return new_pm, None

        def group(i, pm):
            acc = None
            for q in range(4):
                pm, dec = acs(pm, soft_ref[4 * i + q])
                if dec is not None:
                    dec = dec << (6 - 2 * q)
                    acc = dec if acc is None else acc | dec
            if acc is not None:
                dec_ref[i] = acc.astype(jnp.uint8)
            else:
                dec_ref[i] = jnp.zeros((N_STATES, b_t), jnp.uint8)
            return pm

        pm = lax.fori_loop(0, chunk // 4, group, pm_ref[:])
        pm_ref[:] = pm - pm[0:1, :]

    return kernel


def _prefetch_kernel(signs_ref, soft_ref, dec_ref, pm_ref):
    """Software-pipelined variant: the branch-metric matmul for super-step
    t+1 is issued BEFORE the ACS of step t consumes bm_t, so the MXU feed
    overlaps the VPU compare-select chain (the production kernel's three
    phases measured perfectly additive -> no overlap)."""
    chunk = soft_ref.shape[0]
    b_t = soft_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)
        pm_ref[:] = jnp.where(row == 0, 0.0, _NEG).astype(jnp.float32)

    signs = signs_ref[:]

    def bm_at(t):
        return jax.lax.dot_general(
            signs, soft_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

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

    def group(i, carry):
        pm, bm = carry
        acc = None
        for q in range(4):
            t = 4 * i + q
            bm_next = bm_at(jnp.minimum(t + 1, chunk - 1))
            pm, dec = acs(pm, bm)
            bm = bm_next
            dec = dec << (6 - 2 * q)
            acc = dec if acc is None else acc | dec
        dec_ref[i] = acc.astype(jnp.uint8)
        return pm, bm

    pm, _ = lax.fori_loop(0, chunk // 4, group, (pm_ref[:], bm_at(0)))
    pm_ref[:] = pm - pm[0:1, :]


def _gmm4_kernel(signs_ref, soft_ref, dec_ref, pm_ref):
    """One block-diagonal branch-metric matmul per GROUP of 4 super-steps:
    signs4 (1024, 32) block-diag @ soft4 (32, b_t) -> (1024, b_t), rows
    256q..256q+255 = bm of super-step 4i+q. The stacked soft operand is
    just soft_ref[4i:4i+4] flattened on sublanes (contiguous, free); the
    matmul count drops 4x (amortizing per-dispatch MXU overhead, which the
    decomposition shows dominates at K=8)."""
    chunk = soft_ref.shape[0]
    b_t = soft_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)
        pm_ref[:] = jnp.where(row == 0, 0.0, _NEG).astype(jnp.float32)

    signs4 = signs_ref[:]  # (1024, 32) block-diag

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
        soft4 = soft_ref[pl.ds(4 * i, 4)].reshape(32, b_t)
        bm4 = jax.lax.dot_general(
            signs4, soft4,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (1024, b_t)
        acc = None
        for q in range(4):
            pm, dec = acs(pm, bm4[256 * q : 256 * (q + 1)])
            dec = dec << (6 - 2 * q)
            acc = dec if acc is None else acc | dec
        dec_ref[i] = acc.astype(jnp.uint8)
        return pm

    pm = lax.fori_loop(0, chunk // 4, group, pm_ref[:])
    pm_ref[:] = pm - pm[0:1, :]


def _dbuf_kernel(signs_ref, soft_ref, dec_ref, pm_ref, bm_ref):
    """Double-buffered bm in VMEM scratch (2, 256, b_t): the dot for
    super-step t+1 targets buffer (t+1)&1 while the ACS consumes buffer
    t&1 — the cross-iteration dependency is buffer-disjoint, so Mosaic can
    overlap the MXU feed with the VPU compare-select chain."""
    chunk = soft_ref.shape[0]
    b_t = soft_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)
        pm_ref[:] = jnp.where(row == 0, 0.0, _NEG).astype(jnp.float32)

    signs = signs_ref[:]

    def dot_to(t, buf):
        bm_ref[buf] = jax.lax.dot_general(
            signs, soft_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

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

    dot_to(0, 0)

    def group(i, pm):
        acc = None
        for q in range(4):
            t = 4 * i + q
            dot_to(jnp.minimum(t + 1, chunk - 1), (t + 1) % 2)
            pm, dec = acs(pm, bm_ref[t % 2])
            dec = dec << (6 - 2 * q)
            acc = dec if acc is None else acc | dec
        dec_ref[i] = acc.astype(jnp.uint8)
        return pm

    pm = lax.fori_loop(0, chunk // 4, group, pm_ref[:])
    pm_ref[:] = pm - pm[0:1, :]


def run_dbuf(soft_t, b_tile=1024, chunk=CHUNK, sdt=None):
    t2, eight, b = soft_t.shape
    n_b = b // b_tile
    n_chunks = t2 // chunk
    signs_np, _ = _radix_tables(_K)
    dt = sdt or soft_t.dtype
    signs = jnp.asarray(signs_np.T, dt)
    soft_t = soft_t.astype(dt)

    @jax.jit
    def go(signs, soft_t):
        return pl.pallas_call(
            _dbuf_kernel,
            grid=(n_b, n_chunks),
            in_specs=[
                pl.BlockSpec((256, 8), lambda j, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 8, b_tile), lambda j, i: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                                   lambda j, i: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t2 // 4, N_STATES, b), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32),
                            pltpu.VMEM((2, 256, b_tile), jnp.float32)],
        )(signs, soft_t)

    return go, (signs, soft_t)


def run_gmm4(soft_t, b_tile=1024, chunk=CHUNK, sdt=None):
    t2, eight, b = soft_t.shape
    n_b = b // b_tile
    n_chunks = t2 // chunk
    signs_np, _ = _radix_tables(_K)  # (8, 256)
    s4 = np.zeros((1024, 32), np.float32)
    for q in range(4):
        s4[256 * q : 256 * (q + 1), 8 * q : 8 * (q + 1)] = signs_np.T
    dt = sdt or soft_t.dtype
    signs4 = jnp.asarray(s4, dt)
    soft_t = soft_t.astype(dt)

    @jax.jit
    def go(signs4, soft_t):
        return pl.pallas_call(
            _gmm4_kernel,
            grid=(n_b, n_chunks),
            in_specs=[
                pl.BlockSpec((1024, 32), lambda j, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 8, b_tile), lambda j, i: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                                   lambda j, i: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t2 // 4, N_STATES, b), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32)],
        )(signs4, soft_t)

    return go, (signs4, soft_t)


def run_variant(kernel_fn, soft_t, b_tile=1024, chunk=CHUNK):
    t2, eight, b = soft_t.shape
    n_b = b // b_tile
    n_chunks = t2 // chunk
    signs_np, _ = _radix_tables(_K)
    signs = jnp.asarray(signs_np.T, soft_t.dtype)

    @jax.jit
    def go(signs, soft_t):
        return pl.pallas_call(
            kernel_fn,
            grid=(n_b, n_chunks),
            in_specs=[
                pl.BlockSpec((256, 8), lambda j, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 8, b_tile), lambda j, i: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                                   lambda j, i: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t2 // 4, N_STATES, b), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32)],
        )(signs, soft_t)

    return go, (signs, soft_t)


def timeit(fn, args, iters, sync):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    dev = jax.devices()[0]
    print(f"device: {dev}, B={B}, NBITS={NBITS}, iters={iters}")
    rng = np.random.default_rng(1)
    soft = jax.device_put(
        rng.standard_normal((B, NBITS + 6, 4)).astype(np.float32), dev)

    # production relayout once (not timed here)
    decs, b0, t2, b, b_tile, n_b, n_chunks = _fwd_decisions(
        soft, CHUNK, None, False)
    soft_t = jnp.moveaxis(
        jnp.pad(soft, ((0, b - B), (0, _K * 4 * CHUNK - (NBITS + 6) % (
            _K * 4 * CHUNK) if (NBITS + 6) % (_K * 4 * CHUNK) else 0), (0, 0)),
            constant_values=0.).reshape(b, -1, 8), 0, 2)
    soft_t = jax.device_put(jax.block_until_ready(soft_t), dev)
    decs = jax.device_put(jax.block_until_ready(decs), dev)
    print(f"soft_t {soft_t.shape} decs {decs.shape}")

    usync = lambda o: float(jnp.sum(o.astype(jnp.float32)))

    results = {}

    # correctness of dbuf vs production decisions first
    fn, args = run_dbuf(soft_t)
    d_db = fn(*args)
    same = bool(jnp.array_equal(d_db, decs))
    print(f"dbuf decisions identical to production: {same}")
    dt = timeit(fn, args, iters, usync)
    results["dbuf"] = dt * 1e3
    print(f"{'dbuf':10s} {dt*1e3:8.3f} ms")

    fn, args16 = run_dbuf(soft_t, sdt=jnp.bfloat16)
    dt = timeit(fn, args16, iters, usync)
    results["dbuf_bf16"] = dt * 1e3
    print(f"{'dbuf_bf16':10s} {dt*1e3:8.3f} ms")

    for name, flags in [("full", (True, True, True)),
                        ("nodec", (True, False, True)),
                        ("noacs", (False, True, True)),
                        ("bmonly", (False, False, True))]:
        fn, args = run_variant(_variant_kernel(*flags), soft_t)
        dt = timeit(fn, args, iters, usync)
        results[name] = dt * 1e3
        print(f"{name:10s} {dt*1e3:8.3f} ms")

    # traceback alone
    from tpudab.ops.viterbi_pallas import _tb_kernel_packed

    @jax.jit
    def tb(decs):
        return pl.pallas_call(
            _tb_kernel_packed,
            grid=(n_b, n_chunks),
            in_specs=[pl.BlockSpec((CHUNK // 4, N_STATES, b_tile),
                                   lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK // 4, 1, b_tile),
                                   lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t2 // 4, 1, b), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((1, b_tile), jnp.int32)],
        )(decs)

    dt = timeit(tb, (decs,), iters, usync)
    results["tbonly"] = dt * 1e3
    print(f"{'tbonly':10s} {dt*1e3:8.3f} ms")

    # end to end (includes the (B,T,4)->(T2,8,B) relayout + unpack glue)
    fn = lambda s: viterbi_decode_pallas_bytes(s, NBITS)
    dt = timeit(fn, (soft,), iters, usync)
    results["e2e"] = dt * 1e3
    print(f"{'e2e':10s} {dt*1e3:8.3f} ms  "
          f"({iters * B * NBITS / (dt * iters) / 1e9 * iters:.2f} Gbit/s)")

    print("\nDecomposition (ms):")
    print(f"  bm matmul feed      : {results['bmonly']:.3f}")
    print(f"  + ACS chain         : {results['nodec'] - results['bmonly']:.3f}")
    print(f"  + decisions+store   : {results['full'] - results['nodec']:.3f}")
    print(f"  fwd total           : {results['full']:.3f}")
    print(f"  traceback           : {results['tbonly']:.3f}")
    print(f"  e2e                 : {results['e2e']:.3f}")


if __name__ == "__main__":
    main()
