"""Experiment: lane-ALIGNED FFT windows kill the carve kernel (run on TPU).

The carve kernel exists because the DAB symbol stride (2552) is lane-
misaligned: every FFT window starts at a different phase within the
128-lane tile, so extraction needs lane rotates (Pallas, ~4 ms/step) or a
slow XLA relayout. But the window START is a free parameter inside the
cyclic prefix: snapping each window DOWN to the previous 128-sample
boundary keeps it fully inside CP+symbol (effective window_offset then
varies 12..139 < CP 504) and makes extraction pure tile-aligned row slices
— plain DMA copies XLA emits at full HBM speed, no hand kernel at all.

The price: a per-symbol time shift delta_s in (-128, 0] adds a KNOWN
linear spectral phase exp(2pi j k delta_s / N) that does NOT cancel in the
differential demap (delta differs between adjacent symbols). It is undone
AFTER the demap by one static (n_sym-1, K) complex multiply (fused
elementwise, ~0.2 ms).

Compares numerics (soft bits after demap+correction) and timing vs the
production carve_rotate + matmul + demap chain at bench shape.
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
from tpudab.ofdm.demod import _dense_demod_matrix, active_bin_indices
from tpudab.constants.interleaver import get_carrier_map_positions


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    float(sum(jnp.asarray(l).astype(jnp.float32).sum()
              for l in jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sum(jnp.asarray(l).astype(jnp.float32).sum()
              for l in jax.tree_util.tree_leaves(out)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<56} {dt * 1e3:8.2f} ms", flush=True)
    return dt, out


def main():
    mode = 1
    p = get_ofdm_params(mode)
    n_sym, n_fft, n_cp = p.nb_symbols, p.nb_fft, p.nb_cyclic_prefix
    stride = n_fft + n_cp
    window_offset = 12
    start = n_cp - window_offset
    f = 256
    k = p.nb_data_carriers

    # REAL OFDM signal required: the window-shift <-> spectral-phase
    # equivalence relies on the cyclic prefix (any window inside the CP
    # sees a cyclic rotation of the same symbol). Random noise would
    # change CONTENT under the shift and the comparison would be
    # meaningless. Clean signal + CFO; noise-free so both paths see
    # identical information.
    from tpudab.synth.modulator import (modulate_frame_bits, Impairments,
                                        apply_impairments)
    rng = np.random.default_rng(0)
    base = []
    for i in range(4):
        bits = rng.integers(0, 2, p.nb_frame_bits).astype(np.uint8)
        iq = modulate_frame_bits(bits, mode)
        base.append(apply_impairments(
            iq, Impairments(freq_offset_hz=1234.5))[:p.nb_frame_length])
    frames = np.stack(base * (f // 4))
    rows = p.nb_frame_length // 128
    re3 = jnp.asarray(np.ascontiguousarray(frames.real, np.float32)
                      .reshape(f, rows, 128), jnp.bfloat16)
    im3 = jnp.asarray(np.ascontiguousarray(frames.imag, np.float32)
                      .reshape(f, rows, 128), jnp.bfloat16)
    freq = jnp.full((f,), 1234.5, jnp.float32)

    wre, wim = _dense_demod_matrix(mode)

    def karatsuba(ar, ai, shp):
        dt = jnp.bfloat16
        mm = lambda a, b: lax.dot_general(
            a, b, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
            preferred_element_type=dt)
        wc = jnp.asarray(wre.reshape(shp), dt)
        wcd = jnp.asarray((wre + wim).reshape(shp), dt)
        wdc = jnp.asarray((wim - wre).reshape(shp), dt)
        m1 = mm((ar + ai).astype(dt), wc)
        m2 = mm(ai, wcd)
        m3 = mm(ar, wdc)
        return m1 - m2, m3 + m1

    def demap(cr, ci):
        dr = cr[:, 1:, :] * cr[:, :-1, :] + ci[:, 1:, :] * ci[:, :-1, :]
        di = ci[:, 1:, :] * cr[:, :-1, :] - cr[:, 1:, :] * ci[:, :-1, :]
        return dr, di

    # ---------------- production: carve kernel + matmul + demap --------
    from tpudab.ops.carve import carve_rotate

    @jax.jit
    def prod(re3, im3, freq):
        xr, xi = carve_rotate(re3, im3, freq, mode, window_offset)
        ar = xr.reshape(f, n_sym, n_fft // 128, 128)
        ai = xi.reshape(f, n_sym, n_fft // 128, 128)
        cr, ci = karatsuba(ar, ai, (n_fft // 128, 128, k))
        return demap(cr, ci)

    # ---------------- aligned: rotate + tile slices + matmul + demap ---
    a_nom = [p.nb_null_period + stride * s + start for s in range(n_sym)]
    r0 = [a // 128 for a in a_nom]            # aligned start row
    delta = [r * 128 - a for r, a in zip(r0, a_nom)]   # in (-128, 0]
    # post-demap correction: diff_l gains exp(2pi j k (d_l - d_{l-1}) / N)
    # per absolute carrier k; columns are in LOGICAL order -> map k per col
    bins = active_bin_indices(mode)
    pos = get_carrier_map_positions(mode)
    k_signed = ((bins[pos.astype(np.int64)] + n_fft // 2) % n_fft
                - n_fft // 2)                 # k in [-K/2, K/2]
    dd = np.array([delta[s + 1] - delta[s] for s in range(n_sym - 1)])
    ang = -2.0 * np.pi * np.outer(dd, k_signed) / n_fft  # conj to undo
    corr_c = np.cos(ang).astype(np.float32)
    corr_s = np.sin(ang).astype(np.float32)

    t_abs = (np.arange(p.nb_frame_length) / SAMPLING_RATE).astype(np.float32)
    t3 = jnp.asarray(t_abs.reshape(rows, 128))

    @jax.jit
    def aligned(re3, im3, freq):
        ph = -2.0 * jnp.pi * freq[:, None, None] * t3[None]
        c, s = jnp.cos(ph), jnp.sin(ph)
        vr = re3.astype(jnp.float32)
        vi = im3.astype(jnp.float32)
        xr = (vr * c - vi * s).astype(jnp.bfloat16)
        xi = (vr * s + vi * c).astype(jnp.bfloat16)
        ar = jnp.stack([lax.slice_in_dim(xr, r, r + n_fft // 128, axis=1)
                        for r in r0], axis=1)   # (f, n_sym, 16, 128)
        ai = jnp.stack([lax.slice_in_dim(xi, r, r + n_fft // 128, axis=1)
                        for r in r0], axis=1)
        cr, ci = karatsuba(ar, ai, (n_fft // 128, 128, k))
        dr, di = demap(cr, ci)
        # undo the per-symbol-pair linear phase (static tables)
        cc = jnp.asarray(corr_c, dr.dtype)[None]
        ss = jnp.asarray(corr_s, dr.dtype)[None]
        return dr * cc - di * ss, di * cc + dr * ss

    t_p, (dr_p, di_p) = timeit("production carve+matmul+demap", prod,
                               re3, im3, freq)
    t_a, (dr_a, di_a) = timeit("aligned slices+matmul+demap+corr", aligned,
                               re3, im3, freq)

    d = np.abs(np.asarray(dr_p, np.float32) - np.asarray(dr_a, np.float32))
    ref = np.abs(np.asarray(dr_p, np.float32)).mean()
    sign_match = float(np.mean(np.sign(np.asarray(dr_p, np.float32))
                               == np.sign(np.asarray(dr_a, np.float32))))
    print(f"mean|diff|/mean|ref| = {d.mean() / ref:.2e}")
    print(f"hard-decision sign match = {sign_match:.6f}")
    print(f"speedup: {t_p / t_a:.2f}x")


if __name__ == "__main__":
    main()
