import numpy as np, jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128

def tryk(name, body):
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = body(x_ref, i_ref)
    try:
        x = jnp.asarray(np.random.rand(C, P).astype(np.float32))
        ii = jnp.asarray(np.random.randint(0, 1000, (C, P)).astype(np.int32))
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, ii)
        jax.block_until_ready(out)
        print(name, "OK")
    except Exception as e:
        print(name, "FAIL", str(e).splitlines()[0][:100])

tryk("floor", lambda x, i: jnp.floor(x[:] * 3.7))
tryk("f2i", lambda x, i: jnp.floor(x[:] * 3.7).astype(jnp.int32).astype(jnp.float32))
tryk("minmax_scalar", lambda x, i: jnp.minimum(jnp.maximum(i[:], jnp.int32(0)), jnp.int32(996)).astype(jnp.float32))
tryk("shift", lambda x, i: jax.lax.shift_right_logical(i[:], jnp.int32(7)).astype(jnp.float32))
tryk("bitand", lambda x, i: jnp.bitwise_and(i[:], jnp.int32(127)).astype(jnp.float32))
tryk("i32_mul_add", lambda x, i: (i[:] * 2 + 1).astype(jnp.float32))
