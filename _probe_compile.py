"""Bisect which part of the fused osc kernel stalls the TPU compile."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.soundfont.filter_pallas import _lane_gather

C = P = 128
which = sys.argv[1]


def timed(name, f):
    t0 = time.perf_counter()
    out = f()
    jax.block_until_ready(out)
    print(f"{name}: compiled+ran in {time.perf_counter()-t0:.1f}s")


if which == "gather1":
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = _lane_gather(x_ref[:], i_ref[:])
    x = jnp.asarray(np.random.randn(C, P).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, P, (C, P)).astype(np.int32))
    timed("single gather", lambda: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx))

elif which == "gather22":
    R = 11
    def k(w0_ref, w1_ref, q_ref, s_ref, o_ref):
        q, s = q_ref[:], s_ref[:]
        acc0 = jnp.zeros((C, P), jnp.float32)
        acc1 = jnp.zeros((C, P), jnp.float32)
        for r in range(R):
            m = q == r
            r0 = jnp.broadcast_to(w0_ref[r:r+1, :], (C, P))
            r1 = jnp.broadcast_to(w1_ref[r:r+1, :], (C, P))
            acc0 = jnp.where(m, _lane_gather(r0, s), acc0)
            acc1 = jnp.where(m, _lane_gather(r1, s), acc1)
        o_ref[:] = acc0 + acc1
    w = jnp.asarray(np.random.randn(R, 128).astype(np.float32))
    q = jnp.asarray(np.random.randint(0, R, (C, P)).astype(np.int32))
    s = jnp.asarray(np.random.randint(0, 128, (C, P)).astype(np.int32))
    timed("22 masked gathers", lambda: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(w, w, q, s))

elif which == "oscgrid":
    # osc body alone over a real-size grid (no filter/mix)
    from pygmu2_tpu.soundfont.filter_pallas import _make_osc_kernel  # noqa
    B, N = 4, 256
    L = 1398
    n_rows = -(-L // 128)
    def k(w0_ref, w1_ref, ratio_r, bf_r, bi_r, o_ref):
        i = pl.program_id(0)
        blk = jax.lax.div(i, jnp.int32(N // C))
        def row(ref):
            return ref[pl.ds(blk, 1), :]
        steps = (jax.lax.rem(i, jnp.int32(N // C)) * jnp.int32(C)
                 + jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)).astype(jnp.float32)
        offset = row(bf_r) + steps * row(ratio_r)
        off_int = jnp.floor(offset)
        frac = offset - off_int
        i0 = jnp.minimum(jnp.maximum(row(bi_r) + off_int.astype(jnp.int32), jnp.int32(0)), jnp.int32(L - 2))
        q = jax.lax.shift_right_logical(i0, jnp.int32(7))
        s = jnp.bitwise_and(i0, jnp.int32(127))
        acc0 = jnp.zeros((C, P), jnp.float32)
        for r in range(n_rows):
            m = q == r
            r0 = jnp.broadcast_to(w0_ref[r:r+1, :], (C, P))
            acc0 = jnp.where(m, _lane_gather(r0, s), acc0)
        o_ref[:] = acc0 * (1.0 - frac)
    T = B * N
    pad = n_rows * 128 - L
    w0 = jnp.asarray(np.random.randn(n_rows, 128).astype(np.float32))
    rows_f = jnp.asarray(np.random.uniform(0, 1, (B, P)).astype(np.float32))
    bi = jnp.full((B, P), 10, jnp.int32)
    wave_spec = pl.BlockSpec((n_rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((B, P), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
    timed("osc grid", lambda: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
        grid=(T // C,),
        in_specs=[wave_spec, wave_spec, row_spec, row_spec, row_spec],
        out_specs=pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM))(
            w0, w0, rows_f, rows_f, bi))
print("done")

if which.startswith("bisect"):
    B, N = 4, 256
    L = 1398
    n_rows = -(-L // 128)
    mode = which[6:]
    def k(w0_ref, ratio_r, bf_r, bi_r, s_in, o_ref):
        i = pl.program_id(0)
        blk = jax.lax.div(i, jnp.int32(N // C))
        def row(ref):
            return ref[pl.ds(blk, 1), :]
        steps = (jax.lax.rem(i, jnp.int32(N // C)) * jnp.int32(C)
                 + jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)).astype(jnp.float32)
        offset = row(bf_r) + steps * row(ratio_r)
        off_int = jnp.floor(offset)
        frac = offset - off_int
        i0 = jnp.minimum(jnp.maximum(row(bi_r) + off_int.astype(jnp.int32), jnp.int32(0)), jnp.int32(L - 2))
        q = jax.lax.shift_right_logical(i0, jnp.int32(7))
        s = jnp.bitwise_and(i0, jnp.int32(127))
        if mode == "noargather":
            o_ref[:] = frac + q.astype(jnp.float32) + s.astype(jnp.float32)
            return
        if mode == "inputidx":
            q = jax.lax.shift_right_logical(s_in[:], jnp.int32(7))
            s = jnp.bitwise_and(s_in[:], jnp.int32(127))
        acc0 = jnp.zeros((C, P), jnp.float32)
        for r in range(n_rows):
            m = q == r
            r0 = jnp.broadcast_to(w0_ref[r:r+1, :], (C, P))
            acc0 = jnp.where(m, _lane_gather(r0, s), acc0)
        o_ref[:] = acc0 * (1.0 - frac)
    T = B * N
    w0 = jnp.asarray(np.random.randn(n_rows, 128).astype(np.float32))
    rows_f = jnp.asarray(np.random.uniform(0, 1, (B, P)).astype(np.float32))
    bi = jnp.full((B, P), 10, jnp.int32)
    s_in = jnp.asarray(np.random.randint(0, L - 2, (T, P)).astype(np.int32))
    wave_spec = pl.BlockSpec((n_rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((B, P), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)
    timed(which, lambda: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((T, P), jnp.float32),
        grid=(T // C,),
        in_specs=[wave_spec, row_spec, row_spec, row_spec,
                  pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, P), lambda i: (i, 0), memory_space=pltpu.VMEM))(
            w0, rows_f, rows_f, bi, s_in))
