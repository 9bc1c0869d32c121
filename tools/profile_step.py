"""Component-level timing of the receive step on the current device.

SUPERSEDED by tools/profile_step3.py (cumulative in-step deltas; this
v1 times components standalone, which overstates dispatch overhead).
Kept for method provenance.

Usage: python tools/profile_step.py  (patient: run alone on the TPU)
"""

import os
import sys
import time

# NOTE: do NOT use PYTHONPATH — it breaks axon TPU plugin discovery.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def timeit(name, fn, iters=5):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<40} {dt * 1e3:9.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    e, f = 8, 16
    n_frames = e * f

    # demod
    from tpudab.ofdm.demod import demod_frames_split
    re = jnp.asarray(rng.standard_normal((n_frames, 196608)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((n_frames, 196608)).astype(np.float32))
    timeit("demod_frames_split (128 frames)",
           lambda: demod_frames_split(re, im, 0.0)[0])

    # viterbi at MSC scale
    from tpudab.ops.viterbi import viterbi_decode
    b, t = 6 * e * f * 4, 3462
    soft = jnp.asarray(rng.standard_normal((b, t + 6, 4)).astype(np.float32))
    dt = timeit(f"viterbi_decode MSC (B={b}, T={t + 6})",
                lambda: viterbi_decode(soft, t), iters=3)
    print(f"  -> {b * t / dt / 1e6:.0f} Mbit/s, "
          f"{dt / (t + 6) * 1e6:.2f} us/step")

    # FIC-scale viterbi
    b2, t2 = e * f * 4, 768
    soft2 = jnp.asarray(rng.standard_normal((b2, t2 + 6, 4)).astype(np.float32))
    dt = timeit(f"viterbi_decode FIC (B={b2}, T={t2 + 6})",
                lambda: viterbi_decode(soft2, t2), iters=3)

    # branch metric einsum alone
    from tpudab.fec.conv import OUTPUT_SIGNS
    signs = jnp.asarray(OUTPUT_SIGNS)
    timeit("bm einsum (B,T,4)x(128,4)",
           lambda: jnp.einsum("btc,rc->btr", soft, signs,
                              preferred_element_type=jnp.float32), iters=3)

    # depuncture scatter at MSC scale
    from tpudab.fec.depuncture import depuncture
    from tpudab.constants.puncture import eep_profile
    prof = eep_profile(108, 3, 0)
    punctured = jnp.asarray(
        rng.standard_normal((b, 108 * 64)).astype(np.float32))
    timeit("depuncture (MSC scale)",
           lambda: depuncture(punctured, prof), iters=3)


if __name__ == "__main__":
    main()
