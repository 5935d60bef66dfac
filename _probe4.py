import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128
B, N = 4, 256
T = B * N
L = 1398

row_spec = pl.BlockSpec((B, P), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
f32row = jnp.asarray(np.random.rand(B, P).astype(np.float32))
i32row = jnp.full((B, P), 10, jnp.int32)

def run(name, stage):
    def k(ratio_r, bf_r, bi_r, o_ref):
        i = pl.program_id(0)
        blk = jax.lax.div(i, jnp.int32(N // C))
        def row(ref):
            return ref[pl.ds(blk, 1), :]
        steps = (jax.lax.rem(i, jnp.int32(N // C)) * jnp.int32(C)
                 + jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)).astype(jnp.float32)
        offset = row(bf_r) + steps * row(ratio_r)
        if stage == 0:
            o_ref[:] = offset; return
        off_int = jnp.floor(offset)
        frac = offset - off_int
        if stage == 1:
            o_ref[:] = frac; return
        abs_idx = row(bi_r) + off_int.astype(jnp.int32)
        if stage == 2:
            o_ref[:] = abs_idx.astype(jnp.float32); return
        i0 = jnp.minimum(jnp.maximum(abs_idx, jnp.int32(0)), jnp.int32(L - 2))
        if stage == 3:
            o_ref[:] = i0.astype(jnp.float32); return
        q = jax.lax.shift_right_logical(i0, jnp.int32(7))
        s = jnp.bitwise_and(i0, jnp.int32(127))
        o_ref[:] = frac + q.astype(jnp.float32) + s.astype(jnp.float32)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
            grid=(T // C,),
            in_specs=[row_spec, row_spec, row_spec],
            out_specs=pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(f32row, f32row, i32row)
        jax.block_until_ready(out)
        print(name, "OK")
    except Exception as e:
        print(name, "FAIL", str(e).splitlines()[0][:90])

for st in range(5):
    run(f"stage{st}", st)
