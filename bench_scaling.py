#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE config 5, runnable without a pod).

Weak-scaling sweep of ShardedReceiveStep over virtual mesh sizes 1/2/4/8
(forced-host CPU devices): per-device work is held constant (2 ensembles x
4 frames per shard) while the mesh grows, so perfect scaling keeps the
per-device sample rate flat. Prints one JSON line per mesh size plus a
summary line with the efficiency at the largest mesh.

Absolute numbers on CPU are meaningless (bench.py on the real chip is the
throughput bench); what this measures is the COST OF THE COLLECTIVES — the
per-subchannel 15-CIF ppermute halo — relative to the embarrassingly
parallel compute, which is topology-shaped the same on a real pod.

Run: python bench_scaling.py          (also used by CI)
"""

import json
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE
    from tpudab.constants.puncture import eep_profile
    from tpudab.msc.subchannel import SubchannelConfig
    from tpudab.parallel.mesh import make_mesh, default_mesh_shape
    from tpudab.parallel.sharded_step import ShardedReceiveStep

    p = get_ofdm_params(1)
    cfg = SubchannelConfig(subch_id=1, start_cu=0, size_cu=24,
                           profile=eep_profile(24, 3, 0))
    e_per_shard, t_per_shard = 2, 4
    reps = int(os.environ.get("TPUDAB_SCALING_REPS", "3"))
    rng = np.random.default_rng(0)

    results = []
    for n_dev in (1, 2, 4, 8):
        shape = (1, 1) if n_dev == 1 else default_mesh_shape(n_dev)
        mesh = make_mesh(n_dev, shape=shape)
        n_ens = shape[0] * e_per_shard
        t_total = shape[1] * t_per_shard
        step = ShardedReceiveStep(mesh, mode=1, subchannels=(cfg,))
        frames = (rng.standard_normal((n_ens, t_total, p.nb_frame_length))
                  + 1j * rng.standard_normal((n_ens, t_total,
                                              p.nb_frame_length)))
        fr, fi, fq = step.shard_inputs(frames, np.zeros(n_ens, np.float32))
        carry = step.init_carry(n_ens)
        carry, out = step(carry, fr, fi, fq)          # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            carry, out = step(carry, fr, fi, fq)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        samples = n_ens * t_total * p.nb_frame_length
        per_dev = samples / dt / n_dev
        results.append({"n_devices": n_dev, "mesh": list(shape),
                        "ensembles": n_ens, "frames": t_total,
                        "samples_per_s_per_device": round(per_dev),
                        "realtime_x_per_device":
                            round(per_dev / SAMPLING_RATE, 2),
                        "step_ms": round(dt * 1e3, 1)})
        print(json.dumps(results[-1]), flush=True)

    eff = (results[-1]["samples_per_s_per_device"]
           / results[0]["samples_per_s_per_device"])
    cores = os.cpu_count() or 1
    # Virtual devices beyond the physical core count time-share cores, so on
    # small hosts the tail of the sweep measures oversubscription, not the
    # halo collective. Report the largest honestly-measurable mesh too.
    honest = [r for r in results if r["n_devices"] <= cores] or results[:1]
    eff_h = (honest[-1]["samples_per_s_per_device"]
             / results[0]["samples_per_s_per_device"])
    print(json.dumps({"metric": "weak_scaling_efficiency_8dev",
                      "value": round(eff, 3), "unit": "fraction_of_linear",
                      "vs_baseline": round(eff, 3), "host_cores": cores,
                      "oversubscribed": results[-1]["n_devices"] > cores,
                      "efficiency_within_cores": round(eff_h, 3),
                      "within_cores_devices": honest[-1]["n_devices"]}),
          flush=True)


if __name__ == "__main__":
    main()
