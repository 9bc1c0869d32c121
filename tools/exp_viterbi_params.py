"""Sweep (chunk, b_tile) for the transposed Pallas Viterbi at production
shape (run alone on TPU): per-call ms for the full decode chain
depuncture_t -> viterbi_decode_pallas_bytes_t on the bench geometry."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def main():
    from tpudab.constants.puncture import eep_profile
    from tpudab.fec.depuncture import depuncture_t
    from tpudab.ops.viterbi_pallas import viterbi_decode_pallas_bytes_t
    prof = eep_profile(108, 3, 0)      # bench subchannel geometry
    n_bits = prof.data_bits
    b = 6 * 16 * 64                    # 6 subch x 16 ens x 64 cifs
    n_punct = int(prof.mask().sum())
    rng = np.random.default_rng(0)
    soft = jnp.asarray(rng.standard_normal((b, n_punct)), jnp.bfloat16)
    st = depuncture_t(soft, prof)
    st = jax.block_until_ready(st)
    print(f"T2p={st.shape[0]} B={b} n_bits={n_bits}", flush=True)
    for chunk in (8, 16, 32, 48):
        if st.shape[0] % chunk:
            continue
        for b_tile in (512, 1024, 2048):
            try:
                by = viterbi_decode_pallas_bytes_t(st, n_bits, chunk=chunk,
                                                   b_tile=b_tile)
                float(by.astype(jnp.float32).sum())
                iters = 10
                t0 = time.perf_counter()
                for _ in range(iters):
                    by = viterbi_decode_pallas_bytes_t(
                        st, n_bits, chunk=chunk, b_tile=b_tile)
                float(by.astype(jnp.float32).sum())
                dt = (time.perf_counter() - t0) / iters
                print(f"chunk={chunk:<3} b_tile={b_tile:<5} {dt*1e3:7.2f} ms",
                      flush=True)
            except Exception as ex:
                print(f"chunk={chunk} b_tile={b_tile}: "
                      f"{type(ex).__name__}: {str(ex)[:100]}", flush=True)

if __name__ == "__main__":
    main()
