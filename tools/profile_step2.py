"""Production-scale per-stage timing of the receive step (VERDICT round-2 #1).

SUPERSEDED by tools/profile_step3.py (cumulative in-step deltas; this
v2 times stages at step shapes but standalone, still paying per-stage
dispatch). Kept for method provenance.

Times the full ReceiveStep at bench shape (16 ensembles x 16 frames) and each
stage at the exact shapes the step feeds it, so the breakdown sums to ~the
step time. Run alone on the TPU: PYTHONPATH=. python tools/profile_step2.py
"""

import os
import sys
import time

# NOTE: do NOT use PYTHONPATH for this — the env var breaks the axon TPU
# plugin's namespace-package discovery; an in-process path insert does not.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.asarray(l).astype(jnp.float32).sum() for l in leaves))


def timeit(name, fn, iters=5):
    fn()  # compile
    sync(fn())
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn()
    sync(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<52} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    e, f = 16, 16
    n_frames = e * f          # 256
    c = f * 4                 # CIFs per ensemble per step
    n_sub = 6

    from __graft_entry__ import _bench_subchannels
    from tpudab.models.step import ReceiveStep

    # ---- full step ----
    step = ReceiveStep(mode=1, subchannels=_bench_subchannels(), n_ensembles=e)
    carry, fr, fi, freq = step.example_args(n_frames=f, seed=0)
    t_step = timeit(f"FULL ReceiveStep (e={e}, f={f})",
                    lambda: step(carry, fr, fi, freq)[1], iters=5)
    sig_s = n_frames * step.params.nb_frame_length / 2.048e6
    print(f"  -> {sig_s / t_step:.0f}x realtime")

    # ---- demod ----
    from tpudab.ofdm.demod import demod_frames_split
    re = jnp.asarray(rng.standard_normal((n_frames, 196608)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((n_frames, 196608)).astype(np.float32))
    t_demod = timeit(f"demod_frames_split ({n_frames} frames)",
                     lambda: demod_frames_split(re, im, 0.0)[0])

    # demod sub-stages
    from tpudab.ops.matfft import matfft
    wr = jnp.asarray(rng.standard_normal((n_frames, 76, 2048)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((n_frames, 76, 2048)).astype(np.float32))
    timeit("  matfft (256x76x2048)", lambda: matfft(wr, wi))

    def pll(fre, fim):
        t_idx = jnp.arange(196608, dtype=jnp.float32) / 2.048e6
        ph = -2.0 * jnp.pi * 1000.0 * t_idx[None, :]
        cph, sph = jnp.cos(ph), jnp.sin(ph)
        return fre * cph - fim * sph, fre * sph + fim * cph
    pll_j = jax.jit(pll)
    timeit("  pll rotate alone", lambda: pll_j(re, im))

    # ---- deinterleave at production scale ----
    from tpudab.msc.interleave import deinterleave_batch
    slice_bits = step.subchannels[0].slice_bits
    buf = jnp.asarray(rng.standard_normal(
        (e, c + 15, slice_bits)).astype(np.float32))
    dj = jax.jit(lambda b: deinterleave_batch(b, c))
    t_d1 = timeit(f"deinterleave_batch 1 subch (e={e}, c={c}, S={slice_bits})",
                  lambda: dj(buf))
    print(f"  -> x{n_sub} subch = {t_d1 * n_sub * 1e3:.2f} ms")

    # ---- depuncture at production scale ----
    from tpudab.fec.depuncture import depuncture
    prof = step.subchannels[0].profile
    punct = jnp.asarray(rng.standard_normal(
        (n_sub * e * c, slice_bits)).astype(np.float32))
    dpj = jax.jit(lambda x: depuncture(x, prof))
    timeit(f"depuncture (B={n_sub * e * c}, S={slice_bits})", lambda: dpj(punct))

    # ---- viterbi at production scale ----
    from tpudab.ops.viterbi_pallas import viterbi_decode_pallas
    from tpudab.ops.viterbi import viterbi_decode
    n_bits = prof.data_bits
    b = n_sub * e * c
    soft = jnp.asarray(rng.standard_normal((b, n_bits + 6, 4)).astype(np.float32))
    t_v = timeit(f"viterbi_pallas (B={b}, T={n_bits + 6})",
                 lambda: viterbi_decode_pallas(soft, n_bits), iters=3)
    print(f"  -> {b * n_bits / t_v / 1e6:.0f} Mbit/s")
    t_vx = timeit(f"viterbi XLA scan (B={b}, T={n_bits + 6})",
                  lambda: viterbi_decode(soft, n_bits), iters=2)
    print(f"  -> {b * n_bits / t_vx / 1e6:.0f} Mbit/s")

    # ---- descramble+pack ----
    from tpudab.fec.prbs import prbs_bits
    from tpudab.utils.bits import jnp_pack_bits
    bits = jnp.asarray(rng.integers(0, 2, (b, n_bits)).astype(np.uint8))
    prbs = jnp.asarray(prbs_bits(n_bits))
    dp = jax.jit(lambda x: jnp_pack_bits(x ^ prbs))
    timeit(f"descramble+pack (B={b}, n={n_bits})", lambda: dp(bits))

    # ---- FIC chain ----
    from tpudab.constants.puncture import FIC_PROFILE
    from tpudab.fec.depuncture import depuncture as dep2
    fic_soft = jnp.asarray(rng.standard_normal(
        (n_frames * 4, 2304)).astype(np.float32))
    def fic_chain(x):
        m = dep2(x, FIC_PROFILE).reshape(-1, FIC_PROFILE.data_bits + 6, 4)
        return viterbi_decode_pallas(m, FIC_PROFILE.data_bits)
    timeit(f"FIC depunct+viterbi (B={n_frames * 4})",
           lambda: jax.jit(fic_chain)(fic_soft), iters=3)


if __name__ == "__main__":
    main()
