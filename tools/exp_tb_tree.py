import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpudab.fec.conv import N_STATES
from tpudab.ops.viterbi_pallas import _fwd_decisions, _K

# The PRE-r5 production traceback (64-sublane masked reduction), embedded
# here as the baseline: the select tree below replaced it in
# tpudab/ops/viterbi_pallas.py, so importing _tb_kernel_packed would now
# compare the tree against itself.
def _tb_kernel_packed(dec_ref, out_ref, state_ref):
    n_groups = dec_ref.shape[0]
    b_t = dec_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        state_ref[:] = jnp.zeros((1, b_t), jnp.int32)

    row = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b_t), 0)

    def group(i, state):
        gb = n_groups - 1 - i
        dec_b = dec_ref[gb].astype(jnp.int32)
        acc = jnp.zeros((1, b_t), jnp.int32)
        for q in range(3, -1, -1):
            dec_t = (dec_b >> (6 - 2 * q)) & 3
            hit = row == state
            j = jnp.sum(jnp.where(hit, dec_t, 0), axis=0, keepdims=True)
            acc = acc | ((state & 3) << (6 - 2 * q))
            state = (state >> _K) | (j << (6 - _K))
        out_ref[gb] = acc.astype(jnp.uint8)
        return state

    state_ref[:] = lax.fori_loop(0, n_groups, group, state_ref[:])

B, NBITS = 6144, 3456
CHUNK = 32

def _tb_kernel_tree(dec_ref, out_ref, state_ref):
    """Traceback via a 6-level binary select tree on the PACKED decision
    bytes: extracts the current state's byte once per super-step (63 vreg
    selects) instead of a 64-sublane masked reduction per step."""
    n_groups = dec_ref.shape[0]
    b_t = dec_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _():
        state_ref[:] = jnp.zeros((1, b_t), jnp.int32)

    def group(i, state):
        gb = n_groups - 1 - i
        dec_b = dec_ref[gb].astype(jnp.int32)              # (64, B_t)
        acc = jnp.zeros((1, b_t), jnp.int32)
        for q in range(3, -1, -1):
            v = dec_b
            for k in range(5, -1, -1):
                half = v.shape[0] // 2
                bit = ((state >> k) & 1) > 0               # (1, B_t) bool
                v = jnp.where(bit, v[half:], v[:half])
            j = (v >> (6 - 2 * q)) & 3                      # (1, B_t)
            acc = acc | ((state & 3) << (6 - 2 * q))
            state = (state >> _K) | (j << (6 - _K))
        out_ref[gb] = acc.astype(jnp.uint8)
        return state

    state_ref[:] = lax.fori_loop(0, n_groups, group, state_ref[:])

rng = np.random.default_rng(1)
soft = jax.device_put(rng.standard_normal((B, NBITS + 6, 4)).astype(np.float32))
decs, b0, t2, b, b_tile, n_b, n_chunks = _fwd_decisions(soft, CHUNK, None, False)
decs = jax.block_until_ready(decs)

def run_tb(kernel):
    @jax.jit
    def go(decs):
        return pl.pallas_call(kernel,
            grid=(n_b, n_chunks),
            in_specs=[pl.BlockSpec((CHUNK // 4, N_STATES, b_tile),
                                   lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK // 4, 1, b_tile),
                                   lambda j, i: (pl.num_programs(1) - 1 - i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t2 // 4, 1, b), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((1, b_tile), jnp.int32)],
        )(decs)
    return go

sync = lambda o: float(jnp.sum(o.astype(jnp.float32)))
old = run_tb(_tb_kernel_packed); new = run_tb(_tb_kernel_tree)
o1, o2 = old(decs), new(decs)
print("identical:", bool(jnp.array_equal(o1, o2)))
for name, fn in (("masked-reduce", old), ("select-tree", new)):
    sync(fn(decs))
    t0 = time.perf_counter()
    for _ in range(20):
        o = fn(decs)
    sync(o)
    print(f"{name:14s} {(time.perf_counter()-t0)/20*1e3:7.3f} ms")
