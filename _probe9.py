import numpy as np, jax, jax.numpy as jnp
from pygmu2_tpu.soundfont.filter_pallas import _lane_gather
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128
n_chunks = 8
T = n_chunks * C
w0 = jnp.asarray(np.random.randn(2, 128).astype(np.float32))
s_np = np.random.randint(0, 128, (T, P)).astype(np.int32)
s_in = jnp.asarray(s_np)

def k(w_ref, s_ref, o_ref):
    def body(ci, carry):
        s = s_ref[pl.ds(ci * C, C), :]
        s = jnp.bitwise_and(s + ci, jnp.int32(127))
        r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
        v = _lane_gather(r0, s)
        o_ref[pl.ds(ci * C, C), :] = v + carry
        return carry + 1.0
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body, jnp.float32(0.0))

try:
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w0, s_in)
    out = np.asarray(out)
    ref = np.stack([
        w0[0][ (s_np[ci*C:(ci+1)*C] + ci) & 127 ] + ci
        for ci in range(n_chunks)
    ]).reshape(T, P)
    print("fori+gather OK correct=", np.allclose(out, ref))
except Exception as e:
    print("FAIL", str(e).splitlines()[0][:100])
