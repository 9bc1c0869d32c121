import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from tpudab.ops.viterbi_pallas import viterbi_decode_pallas_bytes

B, NBITS = 6144, 3456
rng = np.random.default_rng(1)
soft = jax.device_put(rng.standard_normal((B, NBITS + 6, 4)).astype(np.float32))
sync = lambda o: float(jnp.sum(o.astype(jnp.float32)))

def t(chunk, b_tile, iters=15):
    fn = lambda s: viterbi_decode_pallas_bytes(s, NBITS, chunk=chunk, b_tile=b_tile)
    try:
        sync(fn(soft))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(soft)
        sync(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"chunk={chunk:4d} b_tile={b_tile:5d}  {dt*1e3:7.3f} ms  {B*NBITS/dt/1e9:6.2f} Gbit/s", flush=True)
    except Exception as e:
        print(f"chunk={chunk:4d} b_tile={b_tile:5d}  FAIL {str(e).splitlines()[0][:60]}", flush=True)

for chunk in (16, 32, 64, 128):
    for b_tile in (512, 1024, 2048):
        t(chunk, b_tile)
