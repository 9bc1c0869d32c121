#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE config 5, runnable without a pod).

Weak-scaling sweep of ShardedReceiveStep over virtual mesh sizes: per-device
work is held constant (2 ensembles x 4 frames per shard) while the mesh
grows, so perfect scaling keeps the per-device sample rate flat.

Methodology (r4, VERDICT r3 item #7):
- Each mesh size runs in its OWN SUBPROCESS pinned with `taskset` to exactly
  one physical core per virtual device (mesh sizes beyond the physical core
  count are reported but flagged oversubscribed — they measure core
  time-sharing, not the collective).
- The halo collective's cost is measured DIRECTLY with a ppermute-only
  microbench on the exact shard shapes the step exchanges (the r3
  with/without-halo subtraction could go negative — run-to-run noise
  exceeded the collective's cost). collective_ms is non-negative by
  construction and collective_fraction = microbench / step time.
- A 2-process jax.distributed + gloo row ("dcn") runs the SAME per-device
  workload with the halo ppermute crossing a PROCESS boundary — the
  CPU-reachable analog of the DCN path (tools/launch_multihost.py topology),
  giving a two-host efficiency number instead of only in-process virtual
  devices.

Writes SCALING_r04.json and prints one JSON summary line.
Run: python bench_scaling.py          (also used by CI)
"""

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time


def _bench_config():
    """Shared workload: one EEP 3-A 24-CU subchannel, 2 ens x 4 frames per
    shard (per-device work constant across mesh sizes)."""
    from tpudab.constants.puncture import eep_profile
    from tpudab.msc.subchannel import SubchannelConfig
    cfg = SubchannelConfig(subch_id=1, start_cu=0, size_cu=24,
                           profile=eep_profile(24, 3, 0))
    return cfg, 2, 4  # cfg, e_per_shard, t_per_shard


def _permute_microbench(mesh, n_time: int, e_l: int, slice_bits: int,
                        iters: int = 64) -> float:
    """Direct cost of ONE halo ppermute on the step's exchange shape
    (E_l, 15, slice_bits) per time shard, in ms (non-negative by
    construction). A fori_loop chains `iters` dependent permutes inside one
    jitted shard_map so dispatch overhead amortizes out."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    if n_time < 2:
        return 0.0
    perm = [(j, j + 1) for j in range(n_time - 1)]

    def body(x):
        return (lax.fori_loop(
            0, iters, lambda i, v: lax.ppermute(v, "time", perm=perm), x),)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("ensemble", None, None),),
        out_specs=(P("ensemble", None, None),), check_vma=False))
    e = mesh.shape["ensemble"] * e_l
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (e, 15, slice_bits)).astype(np.float32))
    (y,) = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    (y,) = fn(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3


def worker(n_dev: int, mesh_shape, reps: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}").strip()
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE
    from tpudab.parallel.mesh import make_mesh
    from tpudab.parallel.sharded_step import ShardedReceiveStep

    p = get_ofdm_params(1)
    cfg, e_per_shard, t_per_shard = _bench_config()
    n_ens = mesh_shape[0] * e_per_shard
    t_total = mesh_shape[1] * t_per_shard
    rng = np.random.default_rng(0)
    frames = (rng.standard_normal((n_ens, t_total, p.nb_frame_length))
              + 1j * rng.standard_normal((n_ens, t_total, p.nb_frame_length)))

    mesh = make_mesh(n_dev, shape=tuple(mesh_shape))
    out = {"n_devices": n_dev, "mesh": list(mesh_shape), "ensembles": n_ens,
           "frames": t_total}
    step = ShardedReceiveStep(mesh, mode=1, subchannels=(cfg,))
    fr, fi, fq = step.shard_inputs(frames, np.zeros(n_ens, np.float32))
    carry = step.init_carry(n_ens)
    carry, res = step(carry, fr, fi, fq)          # compile + warm
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry, res = step(carry, fr, fi, fq)
    jax.block_until_ready(res)
    out["step_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 2)

    samples = n_ens * t_total * p.nb_frame_length
    per_dev = samples / (out["step_ms"] / 1e3) / n_dev
    out["samples_per_s_per_device"] = round(per_dev)
    out["realtime_x_per_device"] = round(per_dev / SAMPLING_RATE, 2)
    out["collective_ms"] = round(_permute_microbench(
        mesh, mesh_shape[1], e_per_shard, cfg.slice_bits), 3)
    out["collective_fraction"] = round(
        out["collective_ms"] / out["step_ms"], 4)
    print("RESULT " + json.dumps(out), flush=True)


def dcn_worker(pid: int, nproc: int, coord: str, reps: int) -> None:
    """One process of the 2-process gloo row: 1 forced-host device per
    process, mesh (1, nproc) over 'time' — the halo ppermute crosses the
    process boundary (DCN-path analog)."""
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpudab.constants.ofdm_params import get_ofdm_params, SAMPLING_RATE
    from tpudab.parallel.mesh import make_mesh
    from tpudab.parallel.sharded_step import ShardedReceiveStep

    p = get_ofdm_params(1)
    cfg, e_per_shard, t_per_shard = _bench_config()
    n_ens, t_total = e_per_shard, nproc * t_per_shard
    rng = np.random.default_rng(0)
    frames = (rng.standard_normal((n_ens, t_total, p.nb_frame_length))
              + 1j * rng.standard_normal((n_ens, t_total, p.nb_frame_length)))

    mesh = make_mesh(shape=(1, nproc))
    step = ShardedReceiveStep(mesh, mode=1, subchannels=(cfg,))
    tiled = (n_ens, t_total, p.nb_frame_length // 128, 128)
    re = np.ascontiguousarray(frames.real, np.float32).reshape(tiled)
    im = np.ascontiguousarray(frames.imag, np.float32).reshape(tiled)
    fspec = NamedSharding(mesh, P("ensemble", "time", None, None))
    g_re = jax.make_array_from_callback(re.shape, fspec, lambda i: re[i])
    g_im = jax.make_array_from_callback(im.shape, fspec, lambda i: im[i])
    fq = np.zeros(n_ens, np.float32)
    g_fq = jax.make_array_from_callback(
        fq.shape, NamedSharding(mesh, P("ensemble")), lambda i: fq[i])
    cz = np.zeros((n_ens, 15, cfg.slice_bits), np.float32)
    cspec = NamedSharding(mesh, P("ensemble", None, None))
    carry = {f"deint_{cfg.subch_id}": jax.make_array_from_callback(
        cz.shape, cspec, lambda i: cz[i])}

    (out,) = step._fn(carry, g_re, g_im, g_fq)     # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        (out,) = step._fn(carry, g_re, g_im, g_fq)
    jax.block_until_ready(out)
    dt_ms = (time.perf_counter() - t0) / reps * 1e3
    samples = n_ens * t_total * p.nb_frame_length
    per_dev = samples / (dt_ms / 1e3) / nproc
    # direct cost of the halo ppermute ACROSS the gloo process boundary on
    # the exact exchange shape (VERDICT r4 item 3: attribute the gap)
    coll_ms = round(_permute_microbench(mesh, nproc, e_per_shard,
                                        cfg.slice_bits, iters=32), 3)
    print("DCN_RESULT " + json.dumps({
        "pid": pid, "step_ms": round(dt_ms, 2),
        "samples_per_s_per_device": round(per_dev),
        "realtime_x_per_device": round(per_dev / SAMPLING_RATE, 2),
        "collective_ms": coll_ms,
    }), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_dcn_row(reps: int, cores: int, have_taskset: bool):
    """Spawn the 2-process gloo row; returns its result dict (or an error
    marker if the distributed runtime is unavailable)."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        cmd = [sys.executable, os.path.abspath(__file__), "--dcn-worker",
               "--process-id", str(pid), "--coordinator", coord,
               "--reps", str(reps)]
        if have_taskset and cores >= 2:
            cmd = ["taskset", "-c", str(pid % cores)] + cmd
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return {"error": "dcn row timed out"}
    rows = []
    for out in outs:
        line = next((l for l in out.splitlines()
                     if l.startswith("DCN_RESULT ")), None)
        if line is None:
            return {"error": "dcn worker failed",
                    "tail": outs[-1][-500:]}
        rows.append(json.loads(line[len("DCN_RESULT "):]))
    # the slower process bounds the row (both run the same global program)
    worst = max(rows, key=lambda r: r["step_ms"])
    return {"n_processes": 2, "devices_per_process": 1,
            "transport": "gloo (DCN-path analog)",
            "step_ms": worst["step_ms"],
            "samples_per_s_per_device": worst["samples_per_s_per_device"],
            "realtime_x_per_device": worst["realtime_x_per_device"],
            "collective_ms": worst.get("collective_ms")}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--dcn-worker", action="store_true")
    ap.add_argument("--devices", type=int)
    ap.add_argument("--mesh", type=str)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", type=str, default="")
    ap.add_argument("--reps", type=int,
                    default=int(os.environ.get("TPUDAB_SCALING_REPS", "5")))
    ap.add_argument("--trials", type=int,
                    default=int(os.environ.get("TPUDAB_SCALING_TRIALS", "3")),
                    help="subprocess trials per config; best kept (the "
                         "shared-host CPU is noisy run-to-run and weak-"
                         "scaling ratios amplify it; best-of-N measures "
                         "capability, not scheduler luck)")
    ap.add_argument("--out", type=str, default="SCALING_r04.json")
    args = ap.parse_args()

    if args.worker:
        worker(args.devices, [int(x) for x in args.mesh.split(",")],
               args.reps)
        return
    if args.dcn_worker:
        dcn_worker(args.process_id, 2, args.coordinator, args.reps)
        return

    from tpudab.parallel.mesh import default_mesh_shape
    cores = os.cpu_count() or 1
    have_taskset = shutil.which("taskset") is not None
    results = []
    for n_dev in (1, 2, 4, 8):
        shape = (1, 1) if n_dev == 1 else default_mesh_shape(n_dev)
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--devices", str(n_dev),
               "--mesh", f"{shape[0]},{shape[1]}", "--reps", str(args.reps)]
        if have_taskset:
            cpus = ",".join(str(i) for i in range(min(n_dev, cores)))
            cmd = ["taskset", "-c", cpus] + cmd
        best = None
        for _ in range(args.trials):
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=1800)
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("RESULT ")), None)
            if line is None:
                sys.stderr.write(proc.stdout + proc.stderr)
                raise RuntimeError(f"worker for {n_dev} devices failed")
            r = json.loads(line[len("RESULT "):])
            if best is None or r["step_ms"] < best["step_ms"]:
                best = r
        r = best
        r["trials"] = args.trials
        r["cores_used"] = min(n_dev, cores) if have_taskset else cores
        r["oversubscribed"] = n_dev > cores
        results.append(r)
        print(json.dumps(r), flush=True)

    dcn = None
    for _ in range(args.trials):
        d = run_dcn_row(args.reps, cores, have_taskset)
        if "step_ms" in d and (dcn is None or d["step_ms"] < dcn["step_ms"]):
            dcn = d
        elif dcn is None:
            dcn = d
    print(json.dumps({"dcn": dcn}), flush=True)

    base = results[0]["samples_per_s_per_device"]
    honest = [r for r in results if not r["oversubscribed"]] or results[:1]
    eff_h = honest[-1]["samples_per_s_per_device"] / base
    eff_all = results[-1]["samples_per_s_per_device"] / base
    summary = {
        "metric": "weak_scaling_efficiency",
        "value": round(eff_h, 3),
        "unit": "fraction_of_linear",
        "vs_baseline": round(eff_h / 0.8, 3),       # target >= 0.80
        "host_cores": cores,
        "pinned": have_taskset,
        "efficiency_within_cores": round(eff_h, 3),
        "within_cores_devices": honest[-1]["n_devices"],
        "efficiency_8dev_oversubscribed": round(eff_all, 3),
        "collective_fraction_largest_honest":
            honest[-1]["collective_fraction"],
        "two_process_gloo": dcn,
        "two_process_gloo_efficiency": (
            round(dcn["samples_per_s_per_device"] / base, 3)
            if "samples_per_s_per_device" in dcn else None),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}),
          flush=True)


if __name__ == "__main__":
    main()
