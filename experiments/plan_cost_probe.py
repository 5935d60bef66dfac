#!/usr/bin/env python
"""Probe: how much of the windowed-kernel render is the host-shipped
refresh-plan math (cummax/take/argsort over the (B, P) moved mask)?

Context: the per-voice window refresh (7c16127) improved the bend-heavy
case to ~1025x but the sustained-chord large-font case read ~913-938x
vs 992-1032x before. Suspects: (a) the plan ops added to the jitted
render, (b) the serial cnt-descriptor wait loop in the kernel.

Run on TPU from the repo root: python experiments/plan_cost_probe.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from pygmu2_tpu.soundfont import filter_pallas as fp
from pygmu2_tpu.soundfont import offline as off


def main():
    seconds = 3.0
    synth, midi = bench.build_workload(large_font=True)
    par_np, ch_np, snap_idx, nb = synth.build_schedule(midi, seconds)
    wave_ext, win_w = off._window_args(synth, par_np, ch_np)
    synth.reset()
    ctrl = off.compute_control(synth, par_np, ch_np, snap_idx)
    gains = off._gain_rows(ctrl, float(synth.master_volume))
    rows = dict(
        gains, **off.window_osc_rows(ctrl, win_w, int(wave_ext.shape[0]))
    )
    rows = {k: jnp.asarray(v) for k, v in rows.items()}
    we = jnp.asarray(wave_ext)
    N = synth.block_size
    B, P = rows["ratio"].shape
    n_chain = 20

    # full kernel chain (the number under suspicion)
    @jax.jit
    def chain_full(rws, w):
        def body(_k, acc):
            r = dict(rws)
            r["base_frac"] = rws["base_frac"] + acc * 1e-30
            o, _ = fp.osc_window_filter_gain_mix_pallas(r, w, N, win_w)
            return acc + o[0, 0] * 1e-30
        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0.0))

    # plan math alone, chained identically
    def plan(ws):
        moved = jnp.any(ws[1:] != ws[:-1], axis=1)
        flag = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), moved.astype(jnp.int32)]
        )
        idx = jnp.arange(B, dtype=jnp.int32)
        cand = jnp.where(flag > 0, idx, jnp.int32(B))
        sufmin = jnp.flip(jax.lax.cummin(jnp.flip(cand)))
        nxt = jnp.concatenate([sufmin[1:], jnp.full((1,), jnp.int32(B))])
        p1 = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32),
             jax.lax.cummax(jnp.where(flag > 0, idx, jnp.int32(-1)))[:-1]]
        )
        p2 = jnp.where(
            p1 >= 0, jnp.take(p1, jnp.maximum(p1, 0)), jnp.int32(-1)
        )
        ws_p2 = jnp.take(ws, jnp.maximum(p2, 0), axis=0)
        mv = ((p2 < 0)[:, None] | (ws != ws_p2)) & (flag > 0)[:, None]
        cnt = jnp.sum(mv, axis=1).astype(jnp.int32)
        mvl = jnp.argsort(~mv, axis=1, stable=True).astype(jnp.int32)
        return flag, nxt, cnt, mvl

    @jax.jit
    def chain_plan(ws):
        def body(_k, acc):
            f, nx, c, m = plan(ws + (acc * 1e-30).astype(jnp.int32))
            return acc + m[0, 0] + c[0] + nx[0] + f[0]
        return jax.lax.fori_loop(0, n_chain, body, jnp.int32(0))

    # plan math without the argsort (cnt/flag/nxt only)
    @jax.jit
    def chain_plan_noargsort(ws):
        def body(_k, acc):
            w = ws + (acc * 1e-30).astype(jnp.int32)
            moved = jnp.any(w[1:] != w[:-1], axis=1)
            flag = jnp.concatenate(
                [jnp.ones((1,), jnp.int32), moved.astype(jnp.int32)]
            )
            idx = jnp.arange(B, dtype=jnp.int32)
            p1 = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32),
                 jax.lax.cummax(
                     jnp.where(flag > 0, idx, jnp.int32(-1)))[:-1]]
            )
            p2 = jnp.where(
                p1 >= 0, jnp.take(p1, jnp.maximum(p1, 0)), jnp.int32(-1)
            )
            ws_p2 = jnp.take(w, jnp.maximum(p2, 0), axis=0)
            mv = ((p2 < 0)[:, None] | (w != ws_p2)) & (flag > 0)[:, None]
            cnt = jnp.sum(mv, axis=1).astype(jnp.int32)
            return acc + cnt[0] + flag[0]
        return jax.lax.fori_loop(0, n_chain, body, jnp.int32(0))

    ws = jnp.asarray(rows["ws"], jnp.int32)

    def timed(fn, *a):
        jax.block_until_ready(fn(*a))
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            runs.append(time.perf_counter() - t0)
        return min(runs) / n_chain

    full = timed(chain_full, rows, we)
    tplan = timed(chain_plan, ws)
    tplan_na = timed(chain_plan_noargsort, ws)

    # refresh stats for this schedule
    moved = np.any(np.asarray(ws)[1:] != np.asarray(ws)[:-1], axis=1)
    print(json.dumps({
        "B": int(B), "P": int(P), "win_w": int(win_w),
        "flagged_blocks": int(moved.sum()) + 1,
        "full_ms": round(full * 1e3, 3),
        "device_rtf": round(seconds / full, 0),
        "plan_ms": round(tplan * 1e3, 3),
        "plan_noargsort_ms": round(tplan_na * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
