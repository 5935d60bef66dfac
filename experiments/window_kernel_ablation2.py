#!/usr/bin/env python
"""Second-round attribution on the CURRENT window kernel (prefetch +
one-wait + tight bounds): where does the remaining time go?

Variants (wrong audio, timing only):
  base      — faithful copy of production
  norefresh — no DMA issue/wait at all
  noidx     — oscillator index math replaced by cheap iota indices
  norows    — all control-row VMEM reads replaced by constants
  notrans   — index/tap transposes skipped
  nogather  — slab gather loop skipped
  noscan    — filter scan replaced by passthrough
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


def _make_kernel_a(N, chunk, B, W, align, ablate):
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
         win, sem) = refs[nf + ni + len(_FILTER_ROWS) :]
        P = tf["ratio"].shape[1]

        def issue_all(b, buf):
            boff = buf * jnp.int32(KS)

            def issue(p, _):
                row0 = pl.multiple_of(
                    jax.lax.shift_right_logical(
                        ws_smem[b, p], jnp.int32(7)
                    ),
                    ralign,
                )
                pltpu.make_async_copy(
                    wave_ref.at[pl.ds(row0, rows_w), :, :],
                    win.at[pl.ds(boff, rows_w), pl.ds(p, 1), :],
                    sem.at[jnp.int32(0)],
                ).start()
                return 0

            jax.lax.fori_loop(0, P, issue, 0)

        def wait_all(buf):
            boff = buf * jnp.int32(KS)
            other = jnp.int32(KS) - boff
            pltpu.make_async_copy(
                win.at[pl.ds(other, rows_w), :, :],
                win.at[pl.ds(boff, rows_w), :, :],
                sem.at[jnp.int32(0)],
            ).wait()

        if "norefresh" not in ablate:
            issue_all(jnp.int32(0), jnp.int32(0))

        def osc_chunk(blk, j, bp):
            def rowf(name):
                if "norows" in ablate:
                    return jnp.full((1, P), 0.5, jnp.float32)
                return tf[name][pl.ds(blk, 1), :]

            def rowi(name):
                if "norows" in ablate:
                    return jnp.full((1, P), 7, jnp.int32)
                return ti[name][pl.ds(blk, 1), :]

            if "noidx" in ablate:
                base = jax.lax.broadcasted_iota(jnp.int32, (CS, P), 0)
                widx = jnp.bitwise_and(base + j, jnp.int32(W - 2))
                frac = base.astype(jnp.float32) * 0.001
                looping = jnp.full((CS, P), True)
                abs_idx = widx
            else:
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
                k = jnp.floor(
                    phi.astype(jnp.float32) * inv_ll
                ).astype(jnp.int32)
                w = phi - k * loop_len
                w = jnp.where(w < 0, w + loop_len, w)
                w = jnp.where(w >= loop_len, w - loop_len, w)
                looping = rowi("loopi") > 0
                idx_eff = jnp.where(looping, loop_start + w, abs_idx)
                ws_row = (
                    jnp.zeros((1, P), jnp.int32)
                    if "norows" in ablate
                    else ws_vmem[pl.ds(blk, 1), :]
                )
                widx = jnp.minimum(
                    jnp.maximum(idx_eff - ws_row, jnp.int32(0)),
                    jnp.int32(W - 2),
                )
            if "notrans" in ablate:
                widx_t = jax.lax.broadcasted_iota(jnp.int32, (P, CS), 1)
            else:
                widx_t = widx.astype(jnp.float32).T.astype(jnp.int32)
            w1_t = widx_t + 1
            q0 = jax.lax.shift_right_logical(widx_t, jnp.int32(7))
            q1 = jax.lax.shift_right_logical(w1_t, jnp.int32(7))
            c0 = jnp.bitwise_and(widx_t, jnp.int32(127))
            c1i = jnp.bitwise_and(w1_t, jnp.int32(127))
            i = blk * jnp.int32(cpb) + j
            boff = bp * jnp.int32(KS)

            def slab_body(s, accs):
                a0, a1 = accs
                slab = win[pl.ds(boff + s, 1)].reshape(P, 128)
                a0 = jnp.where(q0 == s, _lane_gather(slab, c0), a0)
                a1 = jnp.where(q1 == s, _lane_gather(slab, c1i), a1)
                return (a0, a1)

            if "nogather" in ablate:
                acc0 = frac.T * 0.5
                acc1 = frac.T * 0.25
            else:
                acc0, acc1 = jax.lax.fori_loop(
                    lo_smem[i], hi_smem[i], slab_body,
                    (jnp.zeros((P, CS), jnp.float32),
                     jnp.zeros((P, CS), jnp.float32)),
                )
            if "notrans" in ablate:
                smp = (1.0 - frac) * acc0.reshape(CS, P) + frac * acc1.reshape(CS, P)
            else:
                smp = (1.0 - frac) * acc0.T + frac * acc1.T
            valid = looping | (abs_idx < rowi("smp_end"))
            return jnp.where(valid, smp, 0.0)

        def body(i, state):
            carry, tail, bp = state
            blk = jax.lax.div(i, jnp.int32(cpb))
            j = jax.lax.rem(i, jnp.int32(cpb))

            if "norefresh" not in ablate:
                flip = (j == 0) & (flag_smem[blk] != 0)
                bp = jnp.where(flip, jnp.int32(1) - bp, bp)

                @pl.when(flip)
                def _():
                    wait_all(bp)
                    nr = nxt_smem[blk]

                    @pl.when(nr < jnp.int32(B))
                    def _():
                        issue_all(nr, jnp.int32(1) - bp)

            x = osc_chunk(blk, j, bp)

            def row(name):
                if "norows" in ablate:
                    return jnp.full((1, P), 0.1, jnp.float32)
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
            return (carry, tail, bp)

        carry_f, tail_f, _bp = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(B * cpb), body,
            (st_in[0:2, :], st_in[2:4, :], jnp.int32(1)),
        )
        st_out[:] = jnp.concatenate([carry_f, tail_f], axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("N", "W", "align", "chunk", "ablate")
)
def window_pass_a(rows, wave_ext, N, W, align=128, chunk=None,
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
        _make_kernel_a(N, chunk, B, W, align, ablate),
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
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )(wave3d, ws, flag, nxt, lo, hi, *tf, *ti, *frows,
      jnp.asarray(state, jnp.float32), ws)
    return jnp.stack([L.reshape(T), R.reshape(T)], axis=1), st_out


def main():
    ablations = sys.argv[1:] or [
        "base", "norefresh", "noidx", "norows", "notrans", "nogather",
        "noscan",
    ]
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

    for ab in ablations:
        abl = frozenset() if ab == "base" else frozenset(ab.split("+"))

        @jax.jit
        def chain(rws, we, abl=abl):
            def body(_k, acc):
                r = dict(rws)
                r["base_frac"] = rws["base_frac"] + acc * 1e-30
                out, _st = window_pass_a(r, we, N, win_w, ablate=abl)
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
            f"{ab:12s} amortized {amort_ms:7.3f} ms  "
            f"device_rtf {seconds / (amort_ms / 1e3):7.0f}x  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
