"""Cumulative in-step breakdown at bench shape with bench-style chained
timing (no per-iter sync): demod -> +deinterleave -> +depuncture ->
+viterbi+descramble (= full step). Isolates what each stage adds INSIDE the
jitted program, which standalone stage timings (profile_step2) overstate by
dispatch overhead. Run alone on the TPU: python tools/profile_step3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit_chained(name, fn, args, iters=10):
    out = fn(*args)
    s = float(sum(jnp.asarray(l).astype(jnp.float32).sum()
                  for l in jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sum(jnp.asarray(l).astype(jnp.float32).sum()
              for l in jax.tree_util.tree_leaves(out)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<56} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    from __graft_entry__ import _bench_subchannels
    from tpudab.models.step import ReceiveStep
    from tpudab.constants.dab_params import get_dab_params, CIF_BITS, CU_BITS
    from tpudab.msc.interleave import deinterleave_batch, TIME_INTERLEAVE_DEPTH
    from tpudab.ofdm.demod import demod_frames_split
    from tpudab.fec.depuncture import depuncture_t
    from tpudab.models.step import _decode_descramble_t

    e, f = 16, 16
    step = ReceiveStep(mode=1, subchannels=_bench_subchannels(), n_ensembles=e)
    carry, fr, fi, freq = step.example_args(n_frames=f, seed=0)
    fr = fr.astype(jnp.bfloat16); fi = fi.astype(jnp.bfloat16)
    dab = get_dab_params(1)
    subch = step.subchannels
    c = f * dab.nb_cifs

    rows = step.params.nb_frame_length // 128
    flat_re = fr.reshape(e * f, rows, 128)
    flat_im = fi.reshape(e * f, rows, 128)
    freq_rep = jnp.zeros((e * f,), jnp.float32)

    @jax.jit
    def stage_demod(re, im, fq):
        soft, stats = demod_frames_split(re, im, fq, 1, 12,
                                         out_dtype="bfloat16")
        return soft

    @jax.jit
    def stage_deint(re, im, fq, carry):
        soft = stage_demod(re, im, fq)
        cifs = soft[:, dab.nb_fic_bits:].reshape(e, c, CIF_BITS)
        outs = []
        for cfg in subch:
            lo = cfg.start_cu * CU_BITS
            sl = jax.lax.slice_in_dim(cifs, lo, lo + cfg.slice_bits, axis=-1)
            buf = jnp.concatenate([carry[f"deint_{cfg.subch_id}"], sl], axis=-2)
            outs.append(deinterleave_batch(buf, c))
        return outs

    @jax.jit
    def stage_depunct(re, im, fq, carry):
        outs = stage_deint(re, im, fq, carry)
        prof = subch[0].profile
        logical = jnp.concatenate([l.reshape(-1, subch[0].slice_bits)
                                   for l in outs], axis=0)
        return depuncture_t(logical, prof)   # production transposed layout

    @jax.jit
    def stage_full_msc(re, im, fq, carry):
        outs = stage_deint(re, im, fq, carry)
        prof = subch[0].profile
        logical = jnp.concatenate([l.reshape(-1, subch[0].slice_bits)
                                   for l in outs], axis=0)
        return _decode_descramble_t(logical, prof, prof.data_bits)

    t_dm = timeit_chained("demod only", stage_demod,
                          (flat_re, flat_im, freq_rep))
    t_di = timeit_chained("+ slice+deinterleave (6 subch)", stage_deint,
                          (flat_re, flat_im, freq_rep, carry))
    t_dp = timeit_chained("+ depuncture", stage_depunct,
                          (flat_re, flat_im, freq_rep, carry))
    t_vt = timeit_chained("+ viterbi+descramble (MSC only, no FIC)",
                          stage_full_msc, (flat_re, flat_im, freq_rep, carry))
    t_st = timeit_chained("FULL ReceiveStep", lambda *a: step(*a)[1],
                          (carry, fr, fi, jnp.float32(0.0)))
    sig_s = e * f * step.params.nb_frame_length / 2.048e6
    print(f"\ndeltas: deint={1e3*(t_di-t_dm):.2f}  depunct={1e3*(t_dp-t_di):.2f}"
          f"  viterbi={1e3*(t_vt-t_dp):.2f}  fic+rest={1e3*(t_st-t_vt):.2f} ms")
    print(f"full step -> {sig_s / t_st:.0f}x realtime")


if __name__ == "__main__":
    main()
