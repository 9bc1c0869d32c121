"""Experiment: transposed depuncture feeding the Viterbi fwd kernel directly
in (T2, 8, B) layout — eliminates the (B,T,4)->(T2,8,B) HBM transpose and
the explicit flush pad (the one-hot zero-pad region is traceback-neutral:
starting at state 0, zero branch metrics keep decision j=0 at state 0, so
the survivor stays at state 0 through the pad exactly like the 1.0-flush).

Validates bit-identical packed-byte output vs the production path, then
times both on the current backend. CPU: python tools/exp_depunct_t.py cpu
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudab.constants.puncture import PunctureProfile
from tpudab.fec.depuncture import _block_runs, depuncture
from tpudab.fec.conv import N_STATES
from tpudab.ops.viterbi import _radix_tables
from tpudab.ops.viterbi_pallas import (_fwd_kernel, _tb_kernel_packed,
                                       viterbi_decode_pallas_bytes)

_K = 2


# depuncture_t: use the library implementation (this tool originally
# carried its own prototype copy; the production one in
# tpudab.fec.depuncture additionally emits the +1.0 flush-bias tail)
from tpudab.fec.depuncture import depuncture_t


def fwd_t(soft_t, b_tile=1024, chunk=16, interpret=False):
    """Fwd ACS on pre-transposed (T2p, 8, B) soft; T2p % chunk == 0,
    B % b_tile == 0. Returns packed decisions (T2p//4, 64, B)."""
    t2, eight, b = soft_t.shape
    assert eight == 4 * _K and t2 % chunk == 0 and b % b_tile == 0
    signs_np, _ = _radix_tables(_K)
    sdt = soft_t.dtype
    signs = jnp.asarray(signs_np.T, sdt)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b // b_tile, t2 // chunk),
        in_specs=[
            pl.BlockSpec((256, 4 * _K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 4 * _K, b_tile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                               lambda j, i: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t2 // 4, N_STATES, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((N_STATES, b_tile), jnp.float32)],
        interpret=interpret,
    )(signs, soft_t)


def tb_t(decs, b_tile=1024, chunk=16, interpret=False):
    t4, _, b = decs.shape
    n_chunks = t4 // (chunk // 4)
    packed = pl.pallas_call(
        _tb_kernel_packed,
        grid=(b // b_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((chunk // 4, N_STATES, b_tile),
                         lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk // 4, 1, b_tile),
                               lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t4, 1, b), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((1, b_tile), jnp.int32)],
        interpret=interpret,
    )(decs)
    return jnp.moveaxis(packed[:, 0, :], 0, 1)  # (B, T2p//4)


def decode_t(punctured, profile, b_tile=1024, interpret=False):
    soft_t = depuncture_t(punctured, profile)
    decs = fwd_t(soft_t, b_tile=b_tile, interpret=interpret)
    by = tb_t(decs, b_tile=b_tile, interpret=interpret)
    return by[:, : profile.data_bits // 8]


def main():
    from tpudab.constants.puncture import eep_profile, FIC_PROFILE
    from tpudab.fec.depuncture import puncture as puncture_np
    from tpudab.fec.conv import conv_encode
    from tpudab.utils.bits import pack_bits

    interpret = jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(5)

    # correctness on a real coded signal (EEP 3-A geometry, small batch)
    prof = eep_profile(108, 3, 0)
    n_bits = prof.data_bits
    b_small = 128 if interpret else 1024
    msgs = rng.integers(0, 2, (b_small, n_bits)).astype(np.uint8)
    coded = np.stack([puncture_np(conv_encode(m), prof) for m in msgs])
    soft = (1.0 - 2.0 * coded + 0.3 * rng.standard_normal(coded.shape)
            ).astype(np.float32)
    softj = jnp.asarray(soft).astype(jnp.bfloat16)

    ref = np.asarray(jax.jit(
        lambda s: viterbi_decode_pallas_bytes(
            jnp.moveaxis(s, 0, 0), n_bits, interpret=interpret),
        static_argnames=())(
        jnp.asarray(depuncture(softj, prof)).reshape(b_small, -1, 4)))
    got = np.asarray(decode_t(softj, prof, b_tile=128 if interpret else 1024,
                              interpret=interpret))
    same = np.array_equal(got, ref)
    exp = pack_bits(msgs)
    print(f"bytes identical to production path: {same}; "
          f"decode correct: {np.array_equal(got, exp)}")
    if not same:
        bad = np.argwhere(got != ref)
        print("first mismatches:", bad[:5], got[tuple(bad[0])], ref[tuple(bad[0])])
        return

    if interpret:
        return

    # timing at production shape
    import time
    b, s_kept = 6144, 6912
    punct = jnp.asarray(rng.standard_normal((b, s_kept)).astype(np.float32)
                        ).astype(jnp.bfloat16)

    prod = jax.jit(lambda p: viterbi_decode_pallas_bytes(
        depuncture(p, prof).reshape(b, -1, 4), n_bits))
    newp = jax.jit(lambda p: decode_t(p, prof))

    def timeit(name, fn, iters=10):
        sync = jax.jit(lambda x: x.astype(jnp.float32).sum())
        float(sync(fn(punct)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(punct)
        float(sync(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:<52} {dt * 1e3:8.2f} ms")

    a = np.asarray(prod(punct))
    bb = np.asarray(newp(punct))
    print("production == transposed at prod shape:", np.array_equal(a, bb))
    timeit("depunct + transpose + fwd + tb (production)", prod)
    timeit("depunct_t + fwd + tb (transposed)", newp)


if __name__ == "__main__":
    main()
