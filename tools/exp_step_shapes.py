"""Batch-shape sweep of the FULL ReceiveStep (run alone on TPU): per-chip
realtime factor vs (ensembles, frames/step). More batch amortizes fixed
per-call overhead but grows decision-tensor HBM residency; the bench picks
whatever this sweep says is best."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def main():
    from __graft_entry__ import _bench_subchannels
    from tpudab.models.step import ReceiveStep
    for e, f in ((16, 16), (16, 24), (16, 32), (24, 16), (32, 16), (8, 32)):
        step = ReceiveStep(mode=1, subchannels=_bench_subchannels(),
                           n_ensembles=e)
        carry, fr, fi, freq = step.example_args(n_frames=f, seed=0)
        fr = fr.astype(jnp.bfloat16); fi = fi.astype(jnp.bfloat16)
        try:
            carry2, out = step(carry, fr, fi, freq)
            float(out["mean_power"].sum())
            iters = 10
            t0 = time.perf_counter()
            c = carry
            for _ in range(iters):
                c, out = step(c, fr, fi, freq)
            float(out["mean_power"].sum())
            dt = (time.perf_counter() - t0) / iters
            sig = e * f * step.params.nb_frame_length / 2.048e6
            print(f"e={e:<3} f={f:<3} step={dt*1e3:8.2f} ms  "
                  f"{sig/dt:7.0f}x realtime", flush=True)
        except Exception as ex:
            print(f"e={e} f={f}: {type(ex).__name__}: {str(ex)[:120]}",
                  flush=True)

if __name__ == "__main__":
    main()
