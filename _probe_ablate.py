"""Ablate the gridless fused kernel to find where time goes."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.soundfont.filter_pallas import (
    _FILTER_ROWS, _OSC_F32_ROWS, _OSC_I32_ROWS, _chunk_pos,
    _filter_mix_math, _lane_gather,
)

B, N, P = 130, 1024, 128
CHUNK = 128
L = 1398
T = B * N
n_chunks = T // CHUNK
n_rows = -(-L // 128)
cpb = N // CHUNK


def make_kernel(mode):
    def kernel(w0_ref, w1_ref, *refs):
        nf, ni = len(_OSC_F32_ROWS), len(_OSC_I32_ROWS)
        row_refs = dict(zip(_OSC_F32_ROWS, refs[:nf]))
        row_refs.update(dict(zip(_OSC_I32_ROWS, refs[nf:nf + ni])))
        l_ref, r_ref = refs[nf + ni:]
        C = CHUNK

        def body(i, state):
            carry, tail = state
            blk = jax.lax.div(i, jnp.int32(cpb))

            def row(name):
                return row_refs[name][pl.ds(blk, 1), :]

            pos = _chunk_pos(i, cpb, C, P)
            steps = pos.astype(jnp.float32)
            offset = row("base_frac") + steps * row("ratio")
            off_int = jnp.floor(offset)
            frac = offset - off_int
            abs_idx = row("base_int") + off_int.astype(jnp.int32)
            loop_start = row("loop_start")
            loop_len = row("loop_len")
            phi = abs_idx - loop_start
            inv_ll = 1.0 / loop_len.astype(jnp.float32)
            k = jnp.floor(phi.astype(jnp.float32) * inv_ll).astype(jnp.int32)
            w = phi - k * loop_len
            w = jnp.where(w < 0, w + loop_len, w)
            w = jnp.where(w >= loop_len, w - loop_len, w)
            looping = row("loopf") > 0.5
            idx_eff = jnp.where(looping, loop_start + w, abs_idx)
            i0 = jnp.minimum(jnp.maximum(idx_eff, jnp.int32(0)),
                             jnp.int32(L - 2))
            q = jax.lax.shift_right_logical(i0, jnp.int32(7))
            s = jnp.bitwise_and(i0, jnp.int32(127))
            if mode == "nogather":
                x = frac + q.astype(jnp.float32) * 0.01 + s.astype(jnp.float32) * 0.001
            else:
                acc0 = jnp.zeros((C, P), jnp.float32)
                acc1 = jnp.zeros((C, P), jnp.float32)
                ngr = 1 if mode == "gather1tap" else n_rows
                for r in range(ngr):
                    m = q == r
                    r0 = jnp.broadcast_to(w0_ref[r:r + 1, :], (C, P))
                    acc0 = jnp.where(m, _lane_gather(r0, s), acc0)
                    if mode != "gather1tap" and mode != "gatherw0only":
                        r1 = jnp.broadcast_to(w1_ref[r:r + 1, :], (C, P))
                        acc1 = jnp.where(m, _lane_gather(r1, s), acc1)
                wrap = looping & ((i0 + 1) >= (loop_start + loop_len))
                w1v = jnp.where(wrap, row("ls_val"), acc1)
                smp = (1.0 - frac) * acc0 + frac * w1v
                valid = looping | (abs_idx < row("smp_end"))
                x = jnp.where(valid, smp, 0.0)

            if mode == "nofilter":
                ml, mr = x * row("gl"), x * row("gr")
            else:
                ml, mr, carry, tail = _filter_mix_math(
                    x, row, pos, N, carry, tail)
            if mode == "notranspose":
                l_ref[pl.ds(i, 1), :] = jnp.sum(
                    ml, axis=1, keepdims=True).T * 0.0 + jnp.zeros((1, CHUNK))
                r_ref[pl.ds(i, 1), :] = jnp.zeros((1, CHUNK))
            else:
                l_ref[pl.ds(i, 1), :] = jnp.sum(ml.T, axis=0, keepdims=True)
                r_ref[pl.ds(i, 1), :] = jnp.sum(mr.T, axis=0, keepdims=True)
            return (carry, tail)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                          (jnp.zeros((2, P), jnp.float32),
                           jnp.zeros((2, P), jnp.float32)))

    return kernel


def run(mode):
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(n_rows * 128).astype(np.float32)
    w0 = jnp.asarray(wave.reshape(n_rows, 128))
    rows = {}
    for kk in _OSC_F32_ROWS:
        rows[kk] = jnp.asarray(rng.uniform(0, 0.5, (B, P)).astype(np.float32))
    rows["ratio"] = jnp.full((B, P), 1.01, jnp.float32)
    rows["loopf"] = jnp.ones((B, P), jnp.float32)
    rows["a1"] = jnp.full((B, P), -0.5, jnp.float32)
    rows["a2"] = jnp.full((B, P), 0.1, jnp.float32)
    rows["base_int"] = jnp.full((B, P), 100, jnp.int32)
    rows["loop_start"] = jnp.full((B, P), 50, jnp.int32)
    rows["loop_len"] = jnp.full((B, P), 1000, jnp.int32)
    rows["smp_end"] = jnp.full((B, P), L, jnp.int32)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        make_kernel(mode),
        out_shape=(jax.ShapeDtypeStruct((n_chunks, CHUNK), jnp.float32),
                   jax.ShapeDtypeStruct((n_chunks, CHUNK), jnp.float32)),
        in_specs=[vspec] * (2 + len(_OSC_F32_ROWS) + len(_OSC_I32_ROWS)),
        out_specs=(vspec, vspec),
    )(*a))
    args = [w0, w0] + [rows[k2] for k2 in _OSC_F32_ROWS] + [
        jnp.asarray(rows[k2], jnp.int32) for k2 in _OSC_I32_ROWS]
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    nit = 20
    for _ in range(nit):
        out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))
    dt = (time.perf_counter() - t0) / nit
    print(f"{mode}: {dt*1e3:.2f} ms/pass (compile {compile_s:.0f}s)")


run(sys.argv[1])
