import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128
B, N = 4, 256
T = B * N

def run(name, k, extra_inputs, extra_specs):
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
            grid=(T // C,),
            in_specs=extra_specs,
            out_specs=pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(*extra_inputs)
        jax.block_until_ready(out)
        print(name, "OK")
    except Exception as e:
        print(name, "FAIL", str(e).splitlines()[0][:90])

row_spec = pl.BlockSpec((B, P), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
f32row = jnp.asarray(np.random.rand(B, P).astype(np.float32))
i32row = jnp.full((B, P), 10, jnp.int32)

# 1: f32 row read (like working filter kernel)
def k1(r_ref, o_ref):
    blk = jax.lax.div(pl.program_id(0), jnp.int32(N // C))
    o_ref[:] = jnp.broadcast_to(r_ref[pl.ds(blk, 1), :], (C, P))
run("f32 row read", k1, [f32row], [row_spec])

# 2: i32 row read + cast
def k2(r_ref, o_ref):
    blk = jax.lax.div(pl.program_id(0), jnp.int32(N // C))
    o_ref[:] = jnp.broadcast_to(r_ref[pl.ds(blk, 1), :], (C, P)).astype(jnp.float32)
run("i32 row read", k2, [i32row], [row_spec])

# 3: i32 row + iota add
def k3(r_ref, o_ref):
    blk = jax.lax.div(pl.program_id(0), jnp.int32(N // C))
    iot = jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)
    o_ref[:] = (r_ref[pl.ds(blk, 1), :] + iot).astype(jnp.float32)
run("i32 row + iota", k3, [i32row], [row_spec])
