"""Benchmark: full-ensemble DAB receive throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: real-time factor per chip — how many simultaneous 2.048 MS/s DAB
ensembles one chip can demodulate AND fully channel-decode (OFDM demod +
FIC Viterbi + all-subchannel MSC deinterleave/depuncture/Viterbi, 6 x 144 kbps
DAB+ services filling 648 of 864 CU). vs_baseline is against the reference's
real-time CPU pipeline (1.0 = real time, its design throughput —
SURVEY.md sec 6: the reference has no published numbers; real-time sustain is
its stated operating point).

Also measured and reported inside the same JSON object: Viterbi decoder
throughput (Mbit/s of decoded payload) and demod-only sample rate.
"""

import json
import os
import sys
import time
import traceback

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _bench_subchannels
    from tpudab.models.step import ReceiveStep
    from tpudab.ops.viterbi_pallas import viterbi_decode_best
    from tpudab.constants.ofdm_params import SAMPLING_RATE

    dev = jax.devices()[0]
    n_frames = int(os.environ.get("TPUDAB_BENCH_FRAMES", "16"))
    n_ens = int(os.environ.get("TPUDAB_BENCH_ENSEMBLES", "16"))

    step = ReceiveStep(mode=1, subchannels=_bench_subchannels(),
                       n_ensembles=n_ens)
    carry, frames_re, frames_im, freq = step.example_args(n_frames=n_frames, seed=0)
    carry = jax.device_put(carry, dev)
    frames_re = jax.device_put(frames_re, dev)
    frames_im = jax.device_put(frames_im, dev)

    def checksum(out):
        """True host-side barrier: reduce every output on device, fetch the
        scalar (block_until_ready alone is not a reliable barrier under the
        axon tunnel backend)."""
        s = out["fic_bytes"].astype(jnp.float32).sum()
        for v in out["subch"].values():
            s = s + v.astype(jnp.float32).sum()
        return float(s)

    # warm-up / compile
    carry, out = step(carry, frames_re, frames_im, freq)
    checksum(out)

    # calibrate: one synced step
    t0 = time.perf_counter()
    carry, out = step(carry, frames_re, frames_im, freq)
    checksum(out)
    t_one = time.perf_counter() - t0
    iters = max(3, min(20, int(5.0 / max(t_one, 1e-3))))

    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = step(carry, frames_re, frames_im, freq)
    checksum(out)
    dt = time.perf_counter() - t0
    samples = iters * n_ens * n_frames * step.params.nb_frame_length
    samples_per_s = samples / dt
    realtime_factor = samples_per_s / SAMPLING_RATE

    # Viterbi microbench at production batch (6 subch x 16 ens x 64 CIFs),
    # payload Mbit/s through the dispatching decoder (Pallas kernel on TPU)
    viterbi_mbit_s = -1.0
    try:
        b, n_bits = 6144, 3456
        rng = np.random.default_rng(1)
        soft = jax.device_put(
            rng.standard_normal((b, n_bits + 6, 4)).astype(np.float32), dev)
        vsync = lambda bits: float(bits.astype(jnp.float32).sum())
        vsync(viterbi_decode_best(soft, n_bits))
        t0 = time.perf_counter()
        v_iters = 5
        for _ in range(v_iters):
            bits = viterbi_decode_best(soft, n_bits)
        vsync(bits)
        v_dt = time.perf_counter() - t0
        viterbi_mbit_s = v_iters * b * n_bits / v_dt / 1e6
    except Exception:
        traceback.print_exc(file=sys.stderr)

    result = {
        "metric": "realtime_factor_per_chip",
        "value": round(realtime_factor, 2),
        "unit": "x_realtime_full_ensemble_decode",
        "vs_baseline": round(realtime_factor, 2),
        "samples_per_s": round(samples_per_s),
        "viterbi_mbit_s": round(viterbi_mbit_s, 2),
        "device": str(dev),
        "n_frames_per_step": n_frames,
        "n_ensembles_per_step": n_ens,
    }
    return result


if __name__ == "__main__":
    # Always emit exactly one JSON line, even on a flaky device runtime.
    try:
        out = main()
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        out = {
            "metric": "realtime_factor_per_chip",
            "value": 0.0,
            "unit": "x_realtime_full_ensemble_decode",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {str(e)[:160]}",
        }
    print(json.dumps(out))
