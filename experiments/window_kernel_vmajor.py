#!/usr/bin/env python
"""Voice-major windowed-DMA kernel prototype.

The production kernel runs time-major (CS, P) like the resident kernel,
which forces 5 (128,128) transposes per 128-sample sub-chunk: the
gather indices (time-major -> voice-major), the two gathered taps
(back), and the two mixed outputs (into (1, CS) output rows). This
prototype runs the WHOLE pipeline voice-major (P, CS): oscillator
index math, window gather, biquad (Kogge-Stone with lane-direction
shifts), gain ramps, and the final mix as a SUBLANE reduction straight
into the (1, CS) output row — zero per-sub-chunk transposes. Control
rows are transposed once per MIDI block via a (128, P) staging scratch.

Measures against the production (prefetching) kernel for both speed and
exactness on the large-font bench workload.
"""

from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from pygmu2_tpu.soundfont import offline as off
from pygmu2_tpu.soundfont import filter_pallas as fp
from pygmu2_tpu.soundfont.filter_pallas import (
    _FILTER_ROWS,
    _WIN_F32_T,
    _WIN_I32_T,
    _lane_gather,
    _window_row_bounds,
)

# column order in the per-block transposed control scratch
_COLS = ("ratio", "base_frac", "base_int", "loop_start", "loop_len",
         "smp_end", "loopi", "ws") + _FILTER_ROWS


def _filter_mix_math_v(x, col, ramp, firstf, c1, c2, t1, t2):
    """Voice-major biquad + gain-ramp + mix for one (P, C) chunk.

    x: (P, C); col(name) -> (P, 1); ramp: (1, C) pos/N; firstf: scalar
    f32 (1.0 when this chunk starts a MIDI block); state planes (P, 1).
    """
    P, C = x.shape
    ff = firstf * (col("freshf") > 0.5).astype(jnp.float32)  # (P, 1)
    keep = 1.0 - ff

    t1k = t1 * keep
    t2k = t2 * keep
    x1 = jnp.concatenate([t2k, x[:, : C - 1]], axis=1)
    x2 = jnp.concatenate([t1k, t2k, x[:, : C - 2]], axis=1)
    fir = col("b0") * x + col("b1") * x1 + col("b2") * x2

    a11 = -col("a1")
    a12 = -col("a2")
    c1k = c1 * keep
    c2k = c2 * keep
    v1 = jnp.concatenate(
        [fir[:, 0:1] + a11 * c1k + a12 * c2k, fir[:, 1:]], axis=1
    )
    v2 = jnp.concatenate([c1k, jnp.zeros((P, C - 1), jnp.float32)], axis=1)

    a21 = jnp.ones((P, 1), jnp.float32)
    a22 = jnp.zeros((P, 1), jnp.float32)
    s = 1
    while s < C:
        def sh(arr):
            left = jnp.zeros((P, s), arr.dtype)
            return jnp.concatenate([left, arr[:, :-s]], axis=1)

        q1 = sh(v1)
        q2 = sh(v2)
        v1 = a11 * q1 + a12 * q2 + v1
        v2 = a21 * q1 + a22 * q2 + v2
        n11 = a11 * a11 + a12 * a21
        n12 = a11 * a12 + a12 * a22
        n21 = a21 * a11 + a22 * a21
        n22 = a21 * a12 + a22 * a22
        a11, a12, a21, a22 = n11, n12, n21, n22
        s *= 2

    y = v1
    nc1 = v1[:, C - 1 : C]
    nc2 = v2[:, C - 1 : C]
    nt1 = x[:, C - 2 : C - 1]
    nt2 = x[:, C - 1 : C]

    def gain(prev_name, cur_name):
        prev = col(prev_name)
        cur = col(cur_name)
        audible = jnp.maximum(prev, cur) >= fp.NON_AUDIBLE
        const = jnp.abs(cur - prev) < 1.0e-3
        g = jnp.where(const, cur, prev + (cur - prev) * ramp)
        return jnp.where(audible, g, 0.0)

    return (gain("pgl", "gl") * y, gain("pgr", "gr") * y,
            nc1, nc2, nt1, nt2)


def _make_window_kernel_v(N: int, chunk: int, B: int, W: int, align: int):
    cpb = N // chunk
    CS = chunk
    KS = W // 128
    rows_w = KS
    ralign = align // 128
    NC = len(_COLS)

    def kernel(wave_ref, ws_smem, flag_smem, nxt_smem, lo_smem, hi_smem,
               *refs):
        nf, ni = len(_WIN_F32_T), len(_WIN_I32_T)
        tf = dict(zip(_WIN_F32_T, refs[:nf]))
        ti = dict(zip(_WIN_I32_T, refs[nf : nf + ni]))
        fr = dict(zip(_FILTER_ROWS, refs[nf + ni : nf + ni + len(_FILTER_ROWS)]))
        rows_all = dict(tf)
        rows_all.update(ti)
        rows_all.update(fr)
        (st_in, ws_vmem, l_ref, r_ref, st_out,
         win, sem, tmp, colsT) = refs[nf + ni + len(_FILTER_ROWS) :]
        P = tf["ratio"].shape[1]

        def _copy(b, buf, p):
            row0 = pl.multiple_of(
                jax.lax.shift_right_logical(ws_smem[b, p], jnp.int32(7)),
                ralign,
            )
            boff = buf * jnp.int32(KS)
            return pltpu.make_async_copy(
                wave_ref.at[pl.ds(row0, rows_w), :, :],
                win.at[pl.ds(boff, rows_w), pl.ds(p, 1), :],
                sem.at[p],
            )

        def issue_all(b, buf):
            def issue(p, _):
                _copy(b, buf, p).start()
                return 0

            jax.lax.fori_loop(0, P, issue, 0)

        def wait_all(b, buf):
            def wait(p, _):
                _copy(b, buf, p).wait()
                return 0

            jax.lax.fori_loop(0, P, wait, 0)

        issue_all(jnp.int32(0), jnp.int32(0))

        def load_cols(blk):
            """Per-block: stage all control rows + ws into (128, P) and
            transpose ONCE into the (P, 128) column scratch. i32 fields
            ride a value cast (all < 2^24 or exact powers of two)."""
            for k, name in enumerate(_COLS):
                if name == "ws":
                    row = ws_vmem[pl.ds(blk, 1), :].astype(jnp.float32)
                elif name == "loopi":
                    row = (ti["loopi"][pl.ds(blk, 1), :]).astype(jnp.float32)
                elif name in ti:
                    row = ti[name][pl.ds(blk, 1), :].astype(jnp.float32)
                else:
                    row = rows_all[name][pl.ds(blk, 1), :]
                tmp[k : k + 1, :] = row
            colsT[:] = tmp[:].T

        def colf(k):
            return colsT[:, k : k + 1]

        _CIDX = {n: k for k, n in enumerate(_COLS)}

        def col(name):
            return colf(_CIDX[name])

        def coli(name):
            return colf(_CIDX[name]).astype(jnp.int32)

        def osc_chunk(blk, j, bp):
            steps = (
                jax.lax.broadcasted_iota(jnp.int32, (P, CS), 1) + j * CS
            ).astype(jnp.float32)
            offset = col("base_frac") + steps * col("ratio")  # (P, CS)
            off_int = jnp.floor(offset)
            frac = offset - off_int
            abs_idx = coli("base_int") + off_int.astype(jnp.int32)
            loop_start = coli("loop_start")
            loop_len = coli("loop_len")
            phi = abs_idx - loop_start
            inv_ll = 1.0 / loop_len.astype(jnp.float32)
            k = jnp.floor(phi.astype(jnp.float32) * inv_ll).astype(jnp.int32)
            w = phi - k * loop_len
            w = jnp.where(w < 0, w + loop_len, w)
            w = jnp.where(w >= loop_len, w - loop_len, w)
            looping = coli("loopi") > 0
            idx_eff = jnp.where(looping, loop_start + w, abs_idx)
            widx = jnp.minimum(
                jnp.maximum(idx_eff - coli("ws"), jnp.int32(0)),
                jnp.int32(W - 2),
            )
            w1v = widx + 1
            q0 = jax.lax.shift_right_logical(widx, jnp.int32(7))
            q1 = jax.lax.shift_right_logical(w1v, jnp.int32(7))
            c0 = jnp.bitwise_and(widx, jnp.int32(127))
            c1i = jnp.bitwise_and(w1v, jnp.int32(127))
            i = blk * jnp.int32(cpb) + j
            boff = bp * jnp.int32(KS)

            def slab_body(s, accs):
                a0, a1 = accs
                slab = win[pl.ds(boff + s, 1)].reshape(P, 128)
                a0 = jnp.where(q0 == s, _lane_gather(slab, c0), a0)
                a1 = jnp.where(q1 == s, _lane_gather(slab, c1i), a1)
                return (a0, a1)

            acc0, acc1 = jax.lax.fori_loop(
                lo_smem[i],
                hi_smem[i],
                slab_body,
                (
                    jnp.zeros((P, CS), jnp.float32),
                    jnp.zeros((P, CS), jnp.float32),
                ),
            )
            smp = (1.0 - frac) * acc0 + frac * acc1  # (P, CS)
            valid = looping | (abs_idx < coli("smp_end"))
            return jnp.where(valid, smp, 0.0)

        def body(i, state):
            c1, c2, t1, t2, bp = state
            blk = jax.lax.div(i, jnp.int32(cpb))
            j = jax.lax.rem(i, jnp.int32(cpb))

            flip = (j == 0) & (flag_smem[blk] != 0)
            bp = jnp.where(flip, jnp.int32(1) - bp, bp)

            @pl.when(flip)
            def _():
                wait_all(blk, bp)
                nr = nxt_smem[blk]

                @pl.when(nr < jnp.int32(B))
                def _():
                    issue_all(nr, jnp.int32(1) - bp)

            @pl.when(j == 0)
            def _():
                load_cols(blk)

            x = osc_chunk(blk, j, bp)  # (P, CS)

            # identical f32 arithmetic to the production kernel's
            # pos * (1/N): int pos first, then one multiply
            pos_row = (
                jax.lax.broadcasted_iota(jnp.int32, (1, CS), 1)
                + j * jnp.int32(CS)
            )
            ramp = pos_row.astype(jnp.float32) * (1.0 / N)
            firstf = (j == 0).astype(jnp.float32)
            ml, mr, c1, c2, t1, t2 = _filter_mix_math_v(
                x, col, ramp, firstf, c1, c2, t1, t2
            )
            l_ref[pl.ds(i, 1), :] = jnp.sum(ml, axis=0, keepdims=True)
            r_ref[pl.ds(i, 1), :] = jnp.sum(mr, axis=0, keepdims=True)
            return (c1, c2, t1, t2, bp)

        z = jnp.zeros((P, 1), jnp.float32)
        c1, c2, t1, t2, _bp = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(B * cpb),
            body,
            (st_in[:, 0:1], st_in[:, 1:2], st_in[:, 2:3], st_in[:, 3:4],
             jnp.int32(1)),
        )
        st_out[:] = jnp.concatenate([c1, c2, t1, t2], axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("N", "W", "align", "chunk")
)
def window_pass_v(rows, wave_ext, N, W, align=128, chunk=None, state=None):
    B, P = rows["ratio"].shape
    T = B * N
    if chunk is None:
        chunk = fp.WINDOW_KERNEL_CHUNK
    chunk = math.gcd(N, min(chunk, N))
    L_ext = wave_ext.shape[0]
    if state is None:
        state = jnp.zeros((4, P), jnp.float32)
    n_chunks = T // chunk

    wave3d = wave_ext.reshape(L_ext // 128, 1, 128)
    tf = [jnp.asarray(rows[k], jnp.float32) for k in _WIN_F32_T]
    ti_src = dict(rows)
    ti_src["loopi"] = (rows["loopf"] > 0.5)
    ti = [jnp.asarray(ti_src[k], jnp.int32) for k in _WIN_I32_T]
    frows = [jnp.asarray(rows[k], jnp.float32) for k in _FILTER_ROWS]
    ws = jnp.asarray(rows["ws"], jnp.int32)
    lo, hi = _window_row_bounds(rows, W, N // chunk, chunk)
    moved = jnp.any(ws[1:] != ws[:-1], axis=1) if B > 1 else jnp.zeros(
        (0,), bool
    )
    flag = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), moved.astype(jnp.int32)]
    )
    idx = jnp.arange(B, dtype=jnp.int32)
    cand = jnp.where(flag > 0, idx, jnp.int32(B))
    sufmin = jnp.flip(jax.lax.cummin(jnp.flip(cand)))
    nxt = jnp.concatenate([sufmin[1:], jnp.full((1,), jnp.int32(B))])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    L, R, st_out = pl.pallas_call(
        _make_window_kernel_v(N, chunk, B, W, align),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((P, 4), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [sspec] * 5
        + [vspec] * (len(_WIN_F32_T) + len(_WIN_I32_T) + len(_FILTER_ROWS) + 2),
        out_specs=(vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((2 * (W // 128), P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((P,)),
            pltpu.VMEM((128, P), jnp.float32),  # staging rows
            pltpu.VMEM((P, 128), jnp.float32),  # transposed columns
        ],
    )(
        wave3d, ws, flag, nxt, lo, hi,
        *tf, *ti, *frows,
        jnp.asarray(state, jnp.float32).T,
        ws,
    )
    return jnp.stack([L.reshape(T), R.reshape(T)], axis=1), st_out.T


def main():
    import bench

    seconds = 3.0
    synth, midi = bench.build_workload(large_font=True)
    par_np, ch_np, snap_idx, nb = synth.build_schedule(midi, seconds)
    ctrl = off.compute_control(synth, par_np, ch_np, snap_idx)
    wave_ext, win_w = off._window_args(synth, par_np, ch_np)
    gains = off._gain_rows(ctrl, float(synth.master_volume))
    rows = dict(gains, **off.window_osc_rows(ctrl, win_w, int(wave_ext.shape[0])))
    rows = {k: jnp.asarray(v) for k, v in rows.items()}
    wave_ext = jnp.asarray(wave_ext)
    N = synth.block_size
    n_chain = 20

    np.asarray(jax.jit(lambda x: x * 2)(np.float32(1.0)))  # warm D2H

    # correctness vs the production kernel
    ref, _ = fp.osc_window_filter_gain_mix_pallas(rows, wave_ext, N, win_w)
    out, _ = window_pass_v(rows, wave_ext, N, win_w)
    ref = np.asarray(ref)
    out = np.asarray(out)
    err = np.abs(ref - out).max()
    print(f"max |vmajor - production| = {err:.3e}  "
          f"(peak {np.abs(ref).max():.3f})", flush=True)

    for name, fn in (
        ("production", lambda r, w: fp.osc_window_filter_gain_mix_pallas(
            r, w, N, win_w)[0]),
        ("vmajor", lambda r, w: window_pass_v(r, w, N, win_w)[0]),
    ):
        @jax.jit
        def chain(rws, we, fn=fn):
            def body(_k, acc):
                r = dict(rws)
                r["base_frac"] = rws["base_frac"] + acc * 1e-30
                return acc + fn(r, we)[0, 0] * 1e-30
            return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        jax.block_until_ready(chain(rows, wave_ext))
        compile_s = time.perf_counter() - t0
        runs = []
        for _ in range(3):
            t1 = time.perf_counter()
            jax.block_until_ready(chain(rows, wave_ext))
            runs.append(time.perf_counter() - t1)
        amort_ms = 1e3 * min(runs) / n_chain
        print(
            f"{name:12s} amortized {amort_ms:7.3f} ms  "
            f"device_rtf {seconds / (amort_ms / 1e3):7.0f}x  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
