"""Carve-kernel ablation experiments (round-3 perf push). Run alone on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE

_LANES = 128


def timeit(name, fn, iters=10):
    out = fn()
    float(sum(jnp.asarray(l).astype(jnp.float32).sum()
              for l in jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(sum(jnp.asarray(l).astype(jnp.float32).sum()
              for l in jax.tree_util.tree_leaves(out)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<56} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def make_variant(fb, do_roll=True, do_rotate=True, vmem_mb=100):
    p = get_ofdm_params(1)
    n_sym, n_fft, n_cp = p.nb_symbols, p.nb_fft, p.nb_cyclic_prefix
    start = n_cp - 12
    rows_per_win = n_fft // _LANES
    frame_rows = p.nb_frame_length // _LANES

    def kernel(ca_ref, sa_ref, ci_ref, si_ref, re_ref, im_ref,
               xr_ref, xi_ref):
        vr = re_ref[...]
        vi = im_ref[...]
        cos_i = ci_ref[...]
        sin_i = si_ref[...]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (fb, rows_per_win, _LANES), 2)
        for s in range(n_sym):
            a = p.nb_null_period + (n_fft + n_cp) * s + start
            r0, ph_lane = divmod(a, _LANES)

            def win(v):
                if ph_lane == 0 or not do_roll:
                    return v[:, r0:r0 + rows_per_win, :]
                lo = pltpu.roll(v[:, r0:r0 + rows_per_win, :],
                                _LANES - ph_lane, 2)
                hi = pltpu.roll(v[:, r0 + 1:r0 + 1 + rows_per_win, :],
                                _LANES - ph_lane, 2)
                return jnp.where(lane < _LANES - ph_lane, lo, hi)

            wr, wi = win(vr), win(vi)
            lo_r = rows_per_win * s
            if do_rotate:
                ca = ca_ref[:, s:s + 1, :]
                sa = sa_ref[:, s:s + 1, :]
                c = ca * cos_i - sa * sin_i
                sn = sa * cos_i + ca * sin_i
                xr_ref[:, lo_r:lo_r + rows_per_win, :] = \
                    (wr * c - wi * sn).astype(xr_ref.dtype)
                xi_ref[:, lo_r:lo_r + rows_per_win, :] = \
                    (wr * sn + wi * c).astype(xi_ref.dtype)
            else:
                xr_ref[:, lo_r:lo_r + rows_per_win, :] = \
                    wr.astype(xr_ref.dtype)
                xi_ref[:, lo_r:lo_r + rows_per_win, :] = \
                    wi.astype(xi_ref.dtype)

    @jax.jit
    def run(re3, im3, freq):
        f = re3.shape[0]
        scale = (-2.0 * np.pi / SAMPLING_RATE) * freq
        idx = jnp.arange(p.nb_fft, dtype=jnp.float32)
        ph_idx = scale[:, None] * idx[None, :]
        cos_i = jnp.cos(ph_idx).reshape(f, rows_per_win, _LANES)
        sin_i = jnp.sin(ph_idx).reshape(f, rows_per_win, _LANES)
        a_sym = (p.nb_null_period + start
                 + (p.nb_fft + n_cp) * np.arange(n_sym)).astype(np.float32)
        ph_a = scale[:, None] * jnp.asarray(a_sym)[None, :]
        ca = jnp.broadcast_to(jnp.cos(ph_a)[:, :, None], (f, n_sym, _LANES))
        sa = jnp.broadcast_to(jnp.sin(ph_a)[:, :, None], (f, n_sym, _LANES))
        out_rows = n_sym * rows_per_win
        blk = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (
            len(shape) - 1), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(f // fb,),
            in_specs=[blk((fb, n_sym, _LANES)), blk((fb, n_sym, _LANES)),
                      blk((fb, rows_per_win, _LANES)),
                      blk((fb, rows_per_win, _LANES)),
                      blk((fb, frame_rows, _LANES)),
                      blk((fb, frame_rows, _LANES))],
            out_specs=[blk((fb, out_rows, _LANES)),
                       blk((fb, out_rows, _LANES))],
            out_shape=[jax.ShapeDtypeStruct((f, out_rows, _LANES), jnp.bfloat16),
                       jax.ShapeDtypeStruct((f, out_rows, _LANES), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
        )(ca, sa, cos_i, sin_i, re3, im3)
    return run


def main():
    p = get_ofdm_params(1)
    rng = np.random.default_rng(0)
    f = 256
    re3 = jnp.asarray(rng.standard_normal(
        (f, p.nb_frame_length // 128, 128)).astype(np.float32))
    im3 = jnp.asarray(rng.standard_normal(
        (f, p.nb_frame_length // 128, 128)).astype(np.float32))
    freq = jnp.zeros((f,), jnp.float32)

    from tpudab.ops.carve import carve_rotate
    timeit("production carve_rotate (fb=8)",
           lambda: carve_rotate(re3, im3, freq))
    for fb in (4, 8, 16):
        try:
            v = make_variant(fb)
            timeit(f"variant fb={fb} full", lambda: v(re3, im3, freq))
        except Exception as e:
            print(f"variant fb={fb} failed: {type(e).__name__}: {str(e)[:120]}")
    v = make_variant(8, do_roll=False)
    timeit("variant fb=8 NO-ROLL (wrong numerics)", lambda: v(re3, im3, freq))
    v = make_variant(8, do_rotate=False)
    timeit("variant fb=8 NO-ROTATE (wrong numerics)", lambda: v(re3, im3, freq))
    v = make_variant(8, do_roll=False, do_rotate=False)
    timeit("variant fb=8 copy-only (lower bound)", lambda: v(re3, im3, freq))


if __name__ == "__main__":
    main()
