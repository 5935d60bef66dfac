import numpy as np, jax, jax.numpy as jnp
from pygmu2_tpu.soundfont.filter_pallas import _lane_gather
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128
T = 4 * 256
w0 = jnp.asarray(np.random.randn(1, 128).astype(np.float32))
s_in = jnp.asarray(np.random.randint(0, 128, (T, P)).astype(np.int32))
wave_spec = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

def run(name, k, specs, inputs, grid):
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((T if grid else C, P), jnp.float32),
            grid=(T // C,) if grid else None,
            in_specs=specs,
            out_specs=pl.BlockSpec((C, P), (lambda i: (i, 0)) if grid else None,
                                   memory_space=pltpu.VMEM),
        )(*inputs)
        jax.block_until_ready(out)
        print(name, "OK")
    except Exception as e:
        print(name, "FAIL", str(e).splitlines()[0][:80])

# A: grid + input s
def kA(w_ref, s_ref, o_ref):
    r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
    o_ref[:] = _lane_gather(r0, s_ref[:])
run("grid + input s", kA,
    [wave_spec, pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    [w0, s_in], True)

# B: no grid + computed s (iota)
def kB(w_ref, o_ref):
    s = jnp.bitwise_and(jax.lax.broadcasted_iota(jnp.int32, (C, P), 0), jnp.int32(127))
    r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
    o_ref[:] = _lane_gather(r0, s)
run("no grid + iota s", kB,
    [pl.BlockSpec(memory_space=pltpu.VMEM)], [w0], False)

# C: no grid + computed s from input arithmetic
def kC(w_ref, s_ref, o_ref):
    s = jnp.bitwise_and(s_ref[:] * 3 + 1, jnp.int32(127))
    r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
    o_ref[:] = _lane_gather(r0, s)
run("no grid + computed s", kC,
    [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2, [w0, s_in[:C]], False)
