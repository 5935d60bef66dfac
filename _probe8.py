import numpy as np, jax, jax.numpy as jnp
from pygmu2_tpu.soundfont.filter_pallas import _lane_gather
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128
T = 4 * 256
w0 = jnp.asarray(np.random.randn(1, 128).astype(np.float32))
wfull = jnp.asarray(np.random.randn(C, P).astype(np.float32))
s_in = jnp.asarray(np.random.randint(0, 128, (T, P)).astype(np.int32))
sC = s_in[:C]

def run(name, k, specs, inputs, grid=True):
    try:
        if grid:
            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
                grid=(T // C,), in_specs=specs,
                out_specs=pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(*inputs)
        else:
            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
                in_specs=specs,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*inputs)
        jax.block_until_ready(out)
        print(name, "OK")
    except Exception as e:
        print(name, "FAIL", str(e).splitlines()[0][:80])

full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
grid_full = pl.BlockSpec((C, P), lambda i: (0, 0), memory_space=pltpu.VMEM)
grid_blk = pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM)

# A: grid + full operand (no broadcast) + input s
def kA(w_ref, s_ref, o_ref):
    o_ref[:] = _lane_gather(w_ref[:], s_ref[:])
run("grid full-op input-s", kA, [grid_full, grid_blk], [wfull, s_in])

# B: no grid + iota s + full operand
def kB(w_ref, o_ref):
    s = jnp.bitwise_and(jax.lax.broadcasted_iota(jnp.int32, (C, P), 0), jnp.int32(127))
    o_ref[:] = _lane_gather(w_ref[:], s)
run("nogrid full-op iota-s", kB, [full_spec], [wfull], grid=False)

# C: no grid + broadcast operand + iota s
def kC(w_ref, o_ref):
    s = jnp.bitwise_and(jax.lax.broadcasted_iota(jnp.int32, (C, P), 0), jnp.int32(127))
    r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
    o_ref[:] = _lane_gather(r0, s)
run("nogrid bcast-op iota-s", kC, [full_spec], [w0], grid=False)

# D: grid=1 + broadcast + input s
def kD(w_ref, s_ref, o_ref):
    r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
    o_ref[:] = _lane_gather(r0, s_ref[:])
run("grid bcast-op input-s", kD,
    [pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM), grid_blk],
    [w0, s_in])
