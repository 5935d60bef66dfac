#!/usr/bin/env python
"""Attribution experiment: where do the windowed-DMA kernel's ms go?

Runs the large-font bench workload (128 voices, 3 s, ~1M-sample font)
through variants of ``osc_window_filter_gain_mix_pallas`` with pieces
ablated, measuring amortized device time with the chained-fori_loop
method (OPTIMIZING.md measurement rule). Ablated variants produce WRONG
audio — they exist only to attribute time.

Usage: python experiments/window_kernel_ablation.py [ablations ...]
Default ablations: none (baseline), norefresh, nogather, noscan, notrans
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


def _make_window_kernel_ablate(N, chunk, B, W, align, ablate):
    cpb = N // chunk
    CS = chunk
    rows_w = W // 128
    ralign = align // 128

    def kernel(wave_ref, ws_smem, lo_smem, hi_smem, *refs):
        nf, ni = len(_WIN_F32_T), len(_WIN_I32_T)
        tf = dict(zip(_WIN_F32_T, refs[:nf]))
        ti = dict(zip(_WIN_I32_T, refs[nf : nf + ni]))
        fr = dict(zip(_FILTER_ROWS, refs[nf + ni : nf + ni + len(_FILTER_ROWS)]))
        (st_in, ws_vmem, l_ref, r_ref, st_out,
         win, sem, cur, chg) = refs[nf + ni + len(_FILTER_ROWS) :]
        P = tf["ratio"].shape[1]

        def initp(p, _):
            cur[p] = jnp.int32(-(2 ** 30))
            return 0

        jax.lax.fori_loop(0, P, initp, 0)

        def refresh(b):
            nodma = "loopnodma" in ablate

            def issue(p, _):
                new = ws_smem[b, p]
                changed = new != cur[p]
                chg[p] = changed.astype(jnp.int32)

                if not nodma:
                    @pl.when(changed)
                    def _():
                        row0 = pl.multiple_of(
                            jax.lax.shift_right_logical(new, jnp.int32(7)),
                            ralign,
                        )
                        pltpu.make_async_copy(
                            wave_ref.at[pl.ds(row0, rows_w), :, :],
                            win.at[:, pl.ds(p, 1), :],
                            sem.at[p],
                        ).start()

                cur[p] = new
                return 0

            jax.lax.fori_loop(0, P, issue, 0)

            if nodma or "nowait" in ablate:
                return

            def wait(p, _):
                @pl.when(chg[p] != 0)
                def _():
                    row0 = pl.multiple_of(
                        jax.lax.shift_right_logical(cur[p], jnp.int32(7)),
                        ralign,
                    )
                    pltpu.make_async_copy(
                        wave_ref.at[pl.ds(row0, rows_w), :, :],
                        win.at[:, pl.ds(p, 1), :],
                        sem.at[p],
                    ).wait()

                return 0

            jax.lax.fori_loop(0, P, wait, 0)

        def osc_chunk(blk, j):
            def rowf(name):
                return tf[name][pl.ds(blk, 1), :]

            def rowi(name):
                return ti[name][pl.ds(blk, 1), :]

            steps = (
                jax.lax.broadcasted_iota(jnp.int32, (CS, P), 0) + j * CS
            ).astype(jnp.float32)
            offset = rowf("base_frac") + steps * rowf("ratio")
            off_int = jnp.floor(offset)
            frac = offset - off_int
            abs_idx = rowi("base_int") + off_int.astype(jnp.int32)
            loop_start = rowi("loop_start")
            loop_len = rowi("loop_len")
            phi = abs_idx - loop_start
            inv_ll = 1.0 / loop_len.astype(jnp.float32)
            k = jnp.floor(phi.astype(jnp.float32) * inv_ll).astype(jnp.int32)
            w = phi - k * loop_len
            w = jnp.where(w < 0, w + loop_len, w)
            w = jnp.where(w >= loop_len, w - loop_len, w)
            looping = rowi("loopi") > 0
            idx_eff = jnp.where(looping, loop_start + w, abs_idx)
            ws_row = ws_vmem[pl.ds(blk, 1), :]
            widx = jnp.minimum(
                jnp.maximum(idx_eff - ws_row, jnp.int32(0)),
                jnp.int32(W - 2),
            )
            if "notrans" in ablate:
                # skip the f32 index transpose AND the smp transposes:
                # gather with iota indices, combine in the wrong
                # orientation (timing-only variant)
                widx_t = jax.lax.broadcasted_iota(jnp.int32, (P, CS), 1)
            else:
                widx_t = widx.astype(jnp.float32).T.astype(jnp.int32)
            w1_t = widx_t + 1
            q0 = jax.lax.shift_right_logical(widx_t, jnp.int32(7))
            q1 = jax.lax.shift_right_logical(w1_t, jnp.int32(7))
            c0 = jnp.bitwise_and(widx_t, jnp.int32(127))
            c1 = jnp.bitwise_and(w1_t, jnp.int32(127))
            i = blk * jnp.int32(cpb) + j

            def slab_body(s, accs):
                a0, a1 = accs
                slab = win[pl.ds(s, 1)].reshape(P, 128)
                a0 = jnp.where(q0 == s, _lane_gather(slab, c0), a0)
                a1 = jnp.where(q1 == s, _lane_gather(slab, c1), a1)
                return (a0, a1)

            def slab_body1(s, a0):
                slab = win[pl.ds(s, 1)].reshape(P, 128)
                return jnp.where(q0 == s, _lane_gather(slab, c0), a0)

            if "nogather" in ablate:
                acc0 = frac.T * 0.5
                acc1 = frac.T * 0.25
            elif "gather1tap" in ablate:
                acc0 = jax.lax.fori_loop(
                    lo_smem[i], hi_smem[i], slab_body1,
                    jnp.zeros((P, CS), jnp.float32),
                )
                acc1 = acc0 * 0.5
            else:
                acc0, acc1 = jax.lax.fori_loop(
                    lo_smem[i],
                    hi_smem[i],
                    slab_body,
                    (
                        jnp.zeros((P, CS), jnp.float32),
                        jnp.zeros((P, CS), jnp.float32),
                    ),
                )
            if "notrans" in ablate:
                smp = (1.0 - frac) * acc0.reshape(CS, P) + frac * acc1.reshape(CS, P)
            else:
                smp = (1.0 - frac) * acc0.T + frac * acc1.T
            valid = looping | (abs_idx < rowi("smp_end"))
            return jnp.where(valid, smp, 0.0)

        def body(i, state):
            carry, tail = state
            blk = jax.lax.div(i, jnp.int32(cpb))
            j = jax.lax.rem(i, jnp.int32(cpb))

            if "norefresh" not in ablate:
                @pl.when(j == 0)
                def _():
                    refresh(blk)

            x = osc_chunk(blk, j)

            def row(name):
                return fr[name][pl.ds(blk, 1), :]

            pos = _chunk_pos(i, cpb, CS, P)
            if "noscan" in ablate:
                ml = row("gl") * x
                mr = row("gr") * x
            else:
                ml, mr, carry, tail = _filter_mix_math(
                    x, row, pos, N, carry, tail
                )
            l_ref[pl.ds(i, 1), :] = jnp.sum(ml.T, axis=0, keepdims=True)
            r_ref[pl.ds(i, 1), :] = jnp.sum(mr.T, axis=0, keepdims=True)
            return (carry, tail)

        carry_f, tail_f = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(B * cpb),
            body,
            (st_in[0:2, :], st_in[2:4, :]),
        )
        st_out[:] = jnp.concatenate([carry_f, tail_f], axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("N", "W", "align", "chunk", "ablate")
)
def window_pass_ablate(rows, wave_ext, N, W, align=128, chunk=None,
                       ablate=frozenset()):
    B, P = rows["ratio"].shape
    T = B * N
    if chunk is None:
        chunk = fp.WINDOW_KERNEL_CHUNK
    chunk = math.gcd(N, min(chunk, N))
    L_ext = wave_ext.shape[0]
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

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    L, R, st_out = pl.pallas_call(
        _make_window_kernel_ablate(N, chunk, B, W, align, ablate),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((4, P), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), sspec, sspec, sspec]
        + [vspec] * (len(_WIN_F32_T) + len(_WIN_I32_T) + len(_FILTER_ROWS) + 2),
        out_specs=(vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((W // 128, P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((P,)),
            pltpu.SMEM((P,), jnp.int32),
            pltpu.SMEM((P,), jnp.int32),
        ],
    )(wave3d, ws, lo, hi, *tf, *ti, *frows,
      jnp.asarray(state, jnp.float32), ws)
    return jnp.stack([L.reshape(T), R.reshape(T)], axis=1), st_out


def main():
    ablations = sys.argv[1:] or ["base", "norefresh", "nogather", "noscan",
                                 "notrans"]
    import bench

    seconds = 3.0
    synth, midi = bench.build_workload(large_font=True)
    par_np, ch_np, snap_idx, nb = synth.build_schedule(midi, seconds)
    ctrl = off.compute_control(synth, par_np, ch_np, snap_idx)
    wave_ext, win_w = off._window_args(synth, par_np, ch_np)
    assert wave_ext is not None, "expected windowed path for large font"
    gains = off._gain_rows(ctrl, float(synth.master_volume))
    rows = dict(gains, **off.window_osc_rows(ctrl, win_w, int(wave_ext.shape[0])))
    rows = {k: jnp.asarray(v) for k, v in rows.items()}
    wave_ext = jnp.asarray(wave_ext)
    N = synth.block_size
    n_chain = 20

    # warm D2H (measurement rule 1b)
    np.asarray(jax.jit(lambda x: x * 2)(np.float32(1.0)))

    for ab in ablations:
        abl = frozenset() if ab == "base" else frozenset(ab.split("+"))

        @jax.jit
        def chain(rws, we):
            def body(_k, acc):
                r = dict(rws)
                r["base_frac"] = rws["base_frac"] + acc * 1e-30
                out, _st = window_pass_ablate(
                    r, we, N, win_w, ablate=abl
                )
                return acc + out[0, 0] * 1e-30
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
            f"{ab:16s} amortized {amort_ms:7.3f} ms  "
            f"device_rtf {seconds / (amort_ms / 1e3):7.0f}x  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
