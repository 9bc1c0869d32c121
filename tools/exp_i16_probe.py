import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, body):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = body(x_ref[:], y_ref[:])
    x = jnp.asarray(np.random.default_rng(0).integers(-100, 100, (64, 256)), jnp.int16)
    y = jnp.asarray(np.random.default_rng(1).integers(-100, 100, (64, 256)), jnp.int16)
    try:
        out = pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int16))(x, y)
        out.block_until_ready()
        print(f"{name:30s} OK")
        return True
    except Exception as e:
        print(f"{name:30s} FAIL: {str(e).splitlines()[0][:90]}")
        return False

probe("add", lambda x, y: x + y)
probe("max", lambda x, y: jnp.maximum(x, y))
probe("mul", lambda x, y: x * y)
probe("shift_right_logical", lambda x, y: jax.lax.shift_right_logical(x, jnp.int16(15)))
probe("shift_right_arith", lambda x, y: jax.lax.shift_right_arithmetic(x, jnp.int16(15)))
probe("and/or", lambda x, y: (x & y) | x)
probe("compare_gt", lambda x, y: (x > y).astype(jnp.int16))
probe("select_by_signshift", lambda x, y: jnp.where((jax.lax.shift_right_logical(x - y, jnp.int16(15))) > 0, x, y))
probe("sub", lambda x, y: x - y)
probe("repeat", lambda x, y: jnp.repeat(x[0:16], 4, axis=0))
probe("i16_to_u8", lambda x, y: (x & 3).astype(jnp.uint8).astype(jnp.int16))
probe("bcast_1row", lambda x, y: x[0:1, :] + y)
probe("bcast_1col_x_1row", lambda x, y: x[:, 0:1] * y[0:1, :])
