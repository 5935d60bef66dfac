import numpy as np, jax, jax.numpy as jnp
from pygmu2_tpu.soundfont.filter_pallas import _lane_gather
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128
B, N = 4, 256
T = B * N
L = 1398
n_rows = -(-L // 128)

row_spec = pl.BlockSpec((B, P), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
wave_spec = pl.BlockSpec((n_rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
f32row = jnp.asarray(np.random.rand(B, P).astype(np.float32))
i32row = jnp.full((B, P), 100, jnp.int32)
w0_np = np.random.randn(n_rows, 128).astype(np.float32)
w0 = jnp.asarray(w0_np)

def run(name, trick):
    def k(w0_ref, ratio_r, bf_r, bi_r, o_ref, scr):
        i = pl.program_id(0)
        blk = jax.lax.div(i, jnp.int32(N // C))
        def row(ref):
            return ref[pl.ds(blk, 1), :]
        steps = (jax.lax.rem(i, jnp.int32(N // C)) * jnp.int32(C)
                 + jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)).astype(jnp.float32)
        offset = row(bf_r) + steps * row(ratio_r)
        off_int = jnp.floor(offset)
        frac = offset - off_int
        abs_idx = row(bi_r) + off_int.astype(jnp.int32)
        i0 = jnp.minimum(jnp.maximum(abs_idx, jnp.int32(0)), jnp.int32(L - 2))
        s = jnp.bitwise_and(i0, jnp.int32(127))
        if trick == "scratch_s":
            scr[:] = s
            s = scr[:]
        elif trick == "opt_barrier":
            s = jax.lax.optimization_barrier(s)
        r0 = jnp.broadcast_to(w0_ref[0:1, :], (C, P))
        if trick == "mat_r0":
            r0 = r0 + jnp.zeros((C, P), jnp.float32)
        if trick == "iota_only":
            s = jnp.bitwise_and(
                jax.lax.broadcasted_iota(jnp.int32, (C, P), 0), jnp.int32(127))
        acc0 = _lane_gather(r0, s)
        o_ref[:] = acc0 * (1.0 - frac)
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
            grid=(T // C,),
            in_specs=[wave_spec, row_spec, row_spec, row_spec],
            out_specs=pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((C, P), jnp.int32)],
        )(w0, f32row, f32row, i32row)
        jax.block_until_ready(out)
        print(name, "OK maxerr-free")
    except Exception as e:
        print(name, "FAIL", str(e).splitlines()[0][:80])

for t in ("none", "scratch_s", "opt_barrier", "mat_r0", "iota_only"):
    run(t, t)
