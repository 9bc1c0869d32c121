"""int16 path-metric Viterbi forward kernel experiment (VERDICT r4 item 4).

The decomposition (tools/exp_viterbi_decompose.py) shows the f32 forward
kernel is vector-issue bound END TO END: the bm matmul's operand/result
transit through the vector datapath (5.5 ms), the ACS chain (1.4 ms) and
the decision pack/store (1.8 ms) are perfectly additive — no MXU/VPU
overlap is achievable (prefetch, double-buffer, and 4-step-fused matmul
variants all measured slower). int16 halves the vector-slot cost of every
(64, B) / (256, B) op: soft quantized to +-127 (the reference's
viterbi_bit_t is int8 — 8-bit soft is reference parity), branch metrics
built on the VPU as 8 rank-1 multiply-accumulates (no MXU round-trip at
all), path metrics int16 with per-group rebase bounding the drift:
  |bm| <= 8*127 = 1016/super-step; rebase every 4 super-steps ->
  drift <= 4064 + trellis spread <= ~6 super-steps * 1016 * 2 ~ 12k
  -> |pm| < 17k << 32767 (no wrap).

Decisions are bit-exact vs the f32 kernel when both consume the SAME
integer-valued soft inputs (all arithmetic exact in both dtypes).

Run: python tools/exp_viterbi_i16.py [iters]
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
from tpudab.ops.viterbi_pallas import _fwd_decisions, _K

B, NBITS = 6144, 3456
CHUNK = 32
NEG_I16 = -16000


def _fwd_kernel_i16(signs_ref, soft_ref, dec_ref, pm_ref):
    """int16 forward: soft (chunk, 8, B_t) int16 in [-127, 127]; signs
    (256, 8) int16 in {-1, +1}; pm scratch int16; bm built on the VPU as
    8 rank-1 madds (sigma_k (256,1) * soft_k (1,B_t))."""
    chunk = soft_ref.shape[0]
    b_t = soft_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)
        pm_ref[:] = jnp.where(row == 0, 0, NEG_I16).astype(jnp.int16)

    signs = signs_ref[:]  # (256, 8) int16

    def acs(pm, t):
        bm = None
        for k in range(8):
            term = signs[:, k : k + 1] * soft_ref[t, k : k + 1, :]
            bm = term if bm is None else bm + term
        c0 = jnp.repeat(pm[0:16], 4, axis=0) + bm[0:64]
        c1 = jnp.repeat(pm[16:32], 4, axis=0) + bm[64:128]
        c2 = jnp.repeat(pm[32:48], 4, axis=0) + bm[128:192]
        c3 = jnp.repeat(pm[48:64], 4, axis=0) + bm[192:256]
        d01 = (c1 > c0).astype(jnp.int16)
        m01 = jnp.maximum(c0, c1)
        d23 = (c3 > c2).astype(jnp.int16)
        m23 = jnp.maximum(c2, c3)
        dh = m23 > m01
        new_pm = jnp.maximum(m01, m23)
        return new_pm, jnp.where(dh, d23 | 2, d01)

    def group(i, pm):
        acc = None
        for q in range(4):
            pm, dec = acs(pm, 4 * i + q)
            dec = dec << (6 - 2 * q)
            acc = dec if acc is None else acc | dec
        dec_ref[i] = acc.astype(jnp.uint8)
        # rebase every group: drift stays far from int16 wrap
        return pm - pm[0:1, :]

    pm_ref[:] = lax.fori_loop(0, chunk // 4, group, pm_ref[:])


def run_i16(soft_t_i16, b_tile=1024, chunk=CHUNK):
    t2, eight, b = soft_t_i16.shape
    n_b = b // b_tile
    n_chunks = t2 // chunk
    signs_np, _ = _radix_tables(_K)
    signs = jnp.asarray(signs_np.T, jnp.int16)

    @jax.jit
    def go(signs, soft_t):
        return pl.pallas_call(
            _fwd_kernel_i16,
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
            scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.int16)],
        )(signs, soft_t)

    return go, (signs, soft_t_i16)


def timeit(fn, args, iters, sync):
    out = fn(*args)
    sync(out)
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
    # integer-valued soft in [-127, 127]: exact in BOTH f32 and int16
    soft_i = rng.integers(-127, 128, (B, NBITS + 6, 4)).astype(np.int16)
    soft_f = jax.device_put(soft_i.astype(np.float32), dev)

    # production f32 kernel decisions for the exactness check
    decs_f, b0, t2, b, b_tile, n_b, n_chunks = _fwd_decisions(
        soft_f, CHUNK, None, False)
    decs_f = jax.block_until_ready(decs_f)

    # same relayout for the int16 input
    pad_t = (-(NBITS + 6)) % (_K * 4 * CHUNK)
    soft_p = np.pad(soft_i, ((0, b - B), (0, pad_t), (0, 0)),
                    constant_values=0)
    # flush pad: +1 pattern (value 127 to match scale is NOT needed for
    # exactness vs f32 on the same input; use 1 like the f32 pad? the f32
    # path pads with 1.0 -> use 1 here)
    if pad_t:
        soft_p[:, NBITS + 6:, :] = 1
    soft_t16 = np.moveaxis(soft_p.reshape(b, -1, 8), 0, 2)
    soft_t16 = jax.device_put(np.ascontiguousarray(soft_t16), dev)
    print(f"soft_t16 {soft_t16.shape}")

    fn, args = run_i16(soft_t16)
    d16 = fn(*args)
    same = bool(jnp.array_equal(d16, decs_f))
    print(f"int16 decisions identical to f32 kernel: {same}")

    usync = lambda o: float(jnp.sum(o.astype(jnp.float32)))
    dt = timeit(fn, args, iters, usync)
    print(f"i16 fwd     {dt*1e3:8.3f} ms")

    base = jax.jit(lambda s: _fwd_decisions(s, CHUNK, None, False)[0])
    dt_f = timeit(base, (soft_f,), iters, usync)
    print(f"f32 fwd     {dt_f*1e3:8.3f} ms  (speedup {dt_f/dt:.2f}x)")


if __name__ == "__main__":
    main()
