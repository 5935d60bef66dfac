import sys, numpy as np, jax, jax.numpy as jnp
from pygmu2_tpu.soundfont.filter_pallas import _lane_gather
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
C = P = 128
n_chunks = 8
T = n_chunks * C
w0 = jnp.asarray(np.random.randn(2, 128).astype(np.float32))
s_np = np.random.randint(0, 128, (T, P)).astype(np.int32)
s_in = jnp.asarray(s_np)
full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

which = sys.argv[1]
if which == "grid_fullspec":
    # grid as the loop; all refs full-shape; manual pl.ds addressing
    def k(w_ref, s_ref, o_ref):
        ci = pl.program_id(0)
        s = s_ref[pl.ds(ci * C, C), :]
        r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
        v = _lane_gather(r0, s)
        o_ref[pl.ds(ci * C, C), :] = v
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
        grid=(n_chunks,),
        in_specs=[full((2, 128)), full((T, P))],
        out_specs=full((T, P)),
    )(w0, s_in)
    print("grid_fullspec OK correct=",
          np.allclose(np.asarray(out), w0[0][s_np]))
elif which == "fori_minimal":
    # gridless fori + gather, static everything else
    def k(w_ref, s_ref, o_ref):
        def body(ci, acc):
            s = s_ref[pl.ds(ci * C, C), :]
            r0 = jnp.broadcast_to(w_ref[0:1, :], (C, P))
            return acc + _lane_gather(r0, s)
        o_ref[:] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_chunks), body,
            jnp.zeros((C, P), jnp.float32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w0, s_in)
    ref = sum(w0[0][s_np[ci*C:(ci+1)*C]] for ci in range(n_chunks))
    print("fori_minimal OK correct=", np.allclose(np.asarray(out), np.asarray(ref)))
