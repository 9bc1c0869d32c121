"""Experiment: carve+DFT as ONE strided convolution (run alone on TPU).

Observation: the DAB symbol stride (nb_fft + nb_cyclic_prefix = 2552 in
mode I) EXCEEDS the FFT window (2048), so consecutive FFT windows never
overlap — extracting window s and contracting it with the dense DFT matrix
is exactly a 1-D convolution over the PLL-rotated frame with kernel 2048,
stride 2552, output features K = 1536. If XLA's TPU conv emitter streams
the strided patches straight into the MXU, the standalone carve kernel
(~4 ms/step: 2 rolls + select + 4-op rotate per window on the VPU) and the
materialized (F, 76, 16, 128) window tensor disappear; the only remaining
elementwise pass is the full-frame PLL rotate (one fused op, ~same element
count as the windows).

Compares numerics + timing vs the production carve_rotate + Karatsuba
matmul path at bench shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE
from tpudab.ofdm.demod import _dense_demod_matrix


def timeit(name, fn, *args, iters=10):
    # axon tunnel: block_until_ready is not a barrier; queue N dispatches
    # then force ONE scalar fetch (bench.py / profile_step3 pattern)
    out = fn(*args)
    float(sum(jnp.asarray(l).astype(jnp.float32).sum()
              for l in jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sum(jnp.asarray(l).astype(jnp.float32).sum()
              for l in jax.tree_util.tree_leaves(out)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<52} {dt * 1e3:8.2f} ms", flush=True)
    return dt, out


def main():
    mode = 1
    p = get_ofdm_params(mode)
    n_sym, n_fft, n_cp = p.nb_symbols, p.nb_fft, p.nb_cyclic_prefix
    stride = n_fft + n_cp
    window_offset = 12
    start = n_cp - window_offset
    a0 = p.nb_null_period + start
    f = 256  # e * f at bench shape

    rng = np.random.default_rng(0)
    fr = rng.standard_normal((f, p.nb_frame_length)).astype(np.float32)
    fi = rng.standard_normal((f, p.nb_frame_length)).astype(np.float32)
    rows = p.nb_frame_length // 128
    re3 = jnp.asarray(fr.reshape(f, rows, 128), jnp.bfloat16)
    im3 = jnp.asarray(fi.reshape(f, rows, 128), jnp.bfloat16)
    freq = jnp.full((f,), 1234.5, jnp.float32)

    wre, wim = _dense_demod_matrix(mode)
    k = wre.shape[1]

    # ---------------- production path: carve kernel + matmul ----------
    from tpudab.ops.carve import carve_rotate

    @jax.jit
    def prod(re3, im3, freq):
        xr, xi = carve_rotate(re3, im3, freq, mode, window_offset)
        ar = xr.reshape(f, n_sym, n_fft // 128, 128)
        ai = xi.reshape(f, n_sym, n_fft // 128, 128)
        dt = jnp.bfloat16
        mm = lambda a, b: lax.dot_general(
            a, b, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
            preferred_element_type=dt)
        shp = (n_fft // 128, 128, k)
        wc = jnp.asarray(wre.reshape(shp), dt)
        wcd = jnp.asarray((wre + wim).reshape(shp), dt)
        wdc = jnp.asarray((wim - wre).reshape(shp), dt)
        m1 = mm((ar + ai).astype(dt), wc)
        m2 = mm(ai, wcd)
        m3 = mm(ar, wdc)
        return m1 - m2, m3 + m1      # (f, n_sym, k) cr, ci

    # ---------------- conv path: full-frame rotate + strided conv -----
    def conv1d(x, w):
        # x (f, L) bf16, w (2048, k) bf16 -> (f, n_sym, k)
        out = lax.conv_general_dilated(
            x[:, None, a0: a0 + (n_sym - 1) * stride + n_fft],
            w.T[:, None, :],             # (k, 1, 2048) OIW
            window_strides=(stride,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NWC"),
            preferred_element_type=jnp.bfloat16)
        return out                       # (f, n_sym, k)

    @jax.jit
    def conv_path(re3, im3, freq):
        flat_r = re3.reshape(f, p.nb_frame_length).astype(jnp.float32)
        flat_i = im3.reshape(f, p.nb_frame_length).astype(jnp.float32)
        t = jnp.arange(p.nb_frame_length, dtype=jnp.float32) / SAMPLING_RATE
        ph = -2.0 * jnp.pi * freq[:, None] * t[None, :]
        c, s = jnp.cos(ph), jnp.sin(ph)
        ar = (flat_r * c - flat_i * s).astype(jnp.bfloat16)
        ai = (flat_r * s + flat_i * c).astype(jnp.bfloat16)
        dt = jnp.bfloat16
        wc = jnp.asarray(wre, dt)
        wcd = jnp.asarray(wre + wim, dt)
        wdc = jnp.asarray(wim - wre, dt)
        m1 = conv1d((ar + ai).astype(dt), wc)
        m2 = conv1d(ai, wcd)
        m3 = conv1d(ar, wdc)
        return m1 - m2, m3 + m1

    t_p, (cr_p, ci_p) = timeit("production carve+matmul", prod,
                               re3, im3, freq)
    t_c, (cr_c, ci_c) = timeit("full-frame rotate + strided conv", conv_path,
                               re3, im3, freq)

    # numerics: compare in f32 (both bf16 paths; rotation orders differ
    # slightly -> allow bf16-scale relative error)
    d = np.abs(np.asarray(cr_p, np.float32) - np.asarray(cr_c, np.float32))
    ref = np.abs(np.asarray(cr_p, np.float32)).mean()
    print(f"mean|diff|/mean|ref| = {d.mean() / ref:.2e}")
    print(f"speedup: {t_p / t_c:.2f}x")


if __name__ == "__main__":
    main()
