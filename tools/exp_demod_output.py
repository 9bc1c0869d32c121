"""Demod output-side decomposition (r5): prices the soft-array
materialization variants that motivated the parts-normalization change in
tpudab/ofdm/demod.py — parts (dr,di) vs +concat/flatten vs +norm-on-flat
vs norm-on-parts. Run alone on the TPU: python tools/exp_demod_output.py
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import ml_dtypes
from tpudab.constants.ofdm_params import get_ofdm_params
from tpudab.ofdm.demod import _dense_demod_matrix
from tpudab.ops.carve import carve_rotate

mode, F = 1, 256
p = get_ofdm_params(mode)
n_sym, n_fft = p.nb_symbols, p.nb_fft
rows = n_fft // 128
rng = np.random.default_rng(0)
re = jax.device_put(rng.standard_normal((F, 1536, 128)).astype(ml_dtypes.bfloat16))
im = jax.device_put(rng.standard_normal((F, 1536, 128)).astype(ml_dtypes.bfloat16))
freq = jnp.float32(1200.0)
dt = jnp.bfloat16

def chain(re3, im3):
    xr, xi = carve_rotate(re3, im3, freq, mode, 12)
    ar = xr.reshape(F, n_sym, rows, 128)
    ai = xi.reshape(F, n_sym, rows, 128)
    wre, wim = _dense_demod_matrix(mode)
    k = wre.shape[1]
    mm = lambda a, b: jax.lax.dot_general(a, b,
        dimension_numbers=(((2, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.bfloat16)
    shp = (rows, 128, k)
    wc = jnp.asarray(wre.reshape(shp), dt)
    wcd = jnp.asarray((wre + wim).reshape(shp), dt)
    wdc = jnp.asarray((wim - wre).reshape(shp), dt)
    m1 = mm((ar + ai).astype(dt), wc); m2 = mm(ai, wcd); m3 = mm(ar, wdc)
    cr = m1 - m2; ci = m3 + m1
    dr = cr[:, 1:, :] * cr[:, :-1, :] + ci[:, 1:, :] * ci[:, :-1, :]
    di = ci[:, 1:, :] * cr[:, :-1, :] - cr[:, 1:, :] * ci[:, :-1, :]
    return dr, di

@jax.jit
def v_parts(re3, im3):  # output dr/di, no concat/reshape/norm
    return chain(re3, im3)

@jax.jit
def v_concat(re3, im3):  # concat+reshape, no norm
    dr, di = chain(re3, im3)
    return jnp.concatenate([dr, di], axis=-1).reshape(F, p.nb_frame_bits)

@jax.jit
def v_norm(re3, im3):  # full: concat+reshape+norm
    dr, di = chain(re3, im3)
    soft = jnp.concatenate([dr, di], axis=-1).reshape(F, p.nb_frame_bits)
    norm = jnp.mean(jnp.abs(soft).astype(jnp.float32), axis=-1, keepdims=True)
    return (soft.astype(jnp.float32) / jnp.maximum(norm, 1e-20)).astype(jnp.bfloat16)

@jax.jit
def v_norm_parts(re3, im3):  # normalize parts, output parts (no concat)
    dr, di = chain(re3, im3)
    s = (jnp.mean(jnp.abs(dr).astype(jnp.float32), axis=(1,2), keepdims=True)
         + jnp.mean(jnp.abs(di).astype(jnp.float32), axis=(1,2), keepdims=True)) * 0.5
    inv = 1.0 / jnp.maximum(s, 1e-20)
    return (dr.astype(jnp.float32) * inv).astype(jnp.bfloat16), \
           (di.astype(jnp.float32) * inv).astype(jnp.bfloat16)

def t(name, fn):
    o = fn(re, im)
    sync = lambda o: float(sum(l.astype(jnp.float32).sum() for l in jax.tree_util.tree_leaves(o)))
    sync(o)
    t0 = time.perf_counter()
    for _ in range(20):
        o = fn(re, im)
    sync(o)
    print(f"{name:16s} {(time.perf_counter()-t0)/20*1e3:7.3f} ms")

t("parts (dr,di)", v_parts)
t("concat", v_concat)
t("concat+norm", v_norm)
t("norm parts", v_norm_parts)
