#!/usr/bin/env python
"""Hybrid-orientation windowed kernel: voice-major oscillator (index
math + gather + interp in (P, CS), ONE transpose back) feeding the
time-major filter scan (which the vmajor experiment showed is faster
than lane-direction shifts). Optional lane-sum output (removes the two
ml.T/mr.T output transposes).

Variants:
  hybrid      — voice-major osc, production filter/mix
  hybrid+lsum — + outputs via lane reduction + (CS,1)->(1,CS) relayout
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
    _chunk_pos,
    _filter_mix_math,
    _lane_gather,
    _window_row_bounds,
)

_OSC_COLS = ("ratio", "base_frac", "base_int", "loop_start", "loop_len",
             "smp_end", "loopi", "ws")


def _make_kernel_h(N, chunk, B, W, align, lsum):
    cpb = N // chunk
    CS = chunk
    KS = W // 128
    rows_w = KS
    ralign = align // 128

    def kernel(wave_ref, ws_smem, flag_smem, nxt_smem, lo_smem, hi_smem,
               *refs):
        nf, ni = len(_WIN_F32_T), len(_WIN_I32_T)
        tf = dict(zip(_WIN_F32_T, refs[:nf]))
        ti = dict(zip(_WIN_I32_T, refs[nf : nf + ni]))
        fr = dict(zip(_FILTER_ROWS, refs[nf + ni : nf + ni + len(_FILTER_ROWS)]))
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
            for k, name in enumerate(_OSC_COLS):
                if name == "ws":
                    row = ws_vmem[pl.ds(blk, 1), :].astype(jnp.float32)
                elif name in ti:
                    row = ti[name][pl.ds(blk, 1), :].astype(jnp.float32)
                else:
                    row = tf[name][pl.ds(blk, 1), :]
                tmp[k : k + 1, :] = row
            colsT[:, : len(_OSC_COLS)] = tmp[: len(_OSC_COLS), :].T

        _CIDX = {n: k for k, n in enumerate(_OSC_COLS)}

        def col(name):
            return colsT[:, _CIDX[name] : _CIDX[name] + 1]

        def coli(name):
            return col(name).astype(jnp.int32)

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
                lo_smem[i], hi_smem[i], slab_body,
                (jnp.zeros((P, CS), jnp.float32),
                 jnp.zeros((P, CS), jnp.float32)),
            )
            smp = (1.0 - frac) * acc0 + frac * acc1  # (P, CS)
            valid = looping | (abs_idx < coli("smp_end"))
            return jnp.where(valid, smp, 0.0).T  # ONE transpose

        def body(i, state):
            carry, tail, bp = state
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

            x = osc_chunk(blk, j, bp)  # (CS, P)

            def row(name):
                return fr[name][pl.ds(blk, 1), :]

            pos = _chunk_pos(i, cpb, CS, P)
            ml, mr, carry, tail = _filter_mix_math(
                x, row, pos, N, carry, tail
            )
            if lsum:
                l_ref[pl.ds(i, 1), :] = jnp.sum(ml, axis=1).reshape(1, CS)
                r_ref[pl.ds(i, 1), :] = jnp.sum(mr, axis=1).reshape(1, CS)
            else:
                l_ref[pl.ds(i, 1), :] = jnp.sum(ml.T, axis=0, keepdims=True)
                r_ref[pl.ds(i, 1), :] = jnp.sum(mr.T, axis=0, keepdims=True)
            return (carry, tail, bp)

        carry_f, tail_f, _bp = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(B * cpb), body,
            (st_in[0:2, :], st_in[2:4, :], jnp.int32(1)),
        )
        st_out[:] = jnp.concatenate([carry_f, tail_f], axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("N", "W", "align", "chunk", "lsum")
)
def window_pass_h(rows, wave_ext, N, W, align=128, chunk=None, lsum=False,
                  state=None):
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
        (0,), bool)
    flag = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), moved.astype(jnp.int32)])
    idx = jnp.arange(B, dtype=jnp.int32)
    cand = jnp.where(flag > 0, idx, jnp.int32(B))
    sufmin = jnp.flip(jax.lax.cummin(jnp.flip(cand)))
    nxt = jnp.concatenate([sufmin[1:], jnp.full((1,), jnp.int32(B))])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    L, R, st_out = pl.pallas_call(
        _make_kernel_h(N, chunk, B, W, align, lsum),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((4, P), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [sspec] * 5
        + [vspec] * (len(_WIN_F32_T) + len(_WIN_I32_T) + len(_FILTER_ROWS) + 2),
        out_specs=(vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((2 * (W // 128), P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((P,)),
            pltpu.VMEM((len(_OSC_COLS), P), jnp.float32),
            pltpu.VMEM((P, len(_OSC_COLS)), jnp.float32),
        ],
    )(wave3d, ws, flag, nxt, lo, hi, *tf, *ti, *frows,
      jnp.asarray(state, jnp.float32), ws)
    return jnp.stack([L.reshape(T), R.reshape(T)], axis=1), st_out


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

    np.asarray(jax.jit(lambda x: x * 2)(np.float32(1.0)))

    ref, _ = fp.osc_window_filter_gain_mix_pallas(rows, wave_ext, N, win_w)
    ref = np.asarray(ref)
    for lsum in (False, True):
        out, _ = window_pass_h(rows, wave_ext, N, win_w, lsum=lsum)
        err = np.abs(ref - np.asarray(out)).max()
        print(f"lsum={lsum}: max err vs production = {err:.3e}", flush=True)

    variants = [
        ("production", lambda r, w: fp.osc_window_filter_gain_mix_pallas(
            r, w, N, win_w)[0]),
        ("hybrid", lambda r, w: window_pass_h(r, w, N, win_w)[0]),
        ("hybrid+lsum", lambda r, w: window_pass_h(
            r, w, N, win_w, lsum=True)[0]),
    ]
    for name, fn in variants:
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
