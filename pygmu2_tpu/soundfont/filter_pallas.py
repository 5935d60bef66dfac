"""Fused Pallas kernels for the SoundFont audio-rate pass.

Two entry points:

``filter_gain_mix_pallas``
    Consumes a precomputed oscillator output ``xt`` (T, P) plus the
    per-(block, voice) control planes and emits the final (T, 2) stereo
    mix: per-voice biquad (blocked Kogge-Stone scan), per-block gain
    ramps, stereo dot-down — one HBM read of xt, two (T, 1) writes.

``osc_filter_gain_mix_pallas``
    The full audio-rate pass in ONE kernel: the oscillator itself
    (position arithmetic, loop wrap, wavetable gather + linear interp)
    runs in VMEM, so the (T, P) oscillator output never exists in HBM.
    The wavetable lives in VMEM as (R, 128) rows plus a shifted twin
    (``wave[i + 1]``) so one ``(row, lane)`` decode serves both lerp
    taps; the per-lane gather is Mosaic's ``tpu.dynamic_gather``
    (via ``lax.gather`` along lanes) with an R-way masked row select.
    Compared to the XLA one-hot path this removes ~5 GB of HBM one-hot
    traffic per 3 s render.

    Mosaic constraint (this jax generation): dynamic_gather fails to
    legalize in any kernel with a *grid*, so this kernel is gridless —
    a single program with a ``fori_loop`` over chunks; everything
    (control rows, wavetable, outputs) is VMEM-resident.  Outputs are
    written as (n_chunks, chunk) rows via an in-kernel transpose (a
    (T, 1) VMEM output would pad each sample row to 128 lanes).

Chunk size must divide the MIDI block size N so each chunk sees exactly
one control row (chunks_per_block = N // chunk).

Reference counterpart: the per-voice block loop of
reference meltysynth/synth/voice.py (oscillator + filter + mix per
block) — here one kernel pass over the whole timeline for all voices.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.soundfont.params import NON_AUDIBLE

# largest wavetable the in-kernel gather path accepts: R = L/128 rows of
# masked dynamic_gather per lerp tap; beyond this the XLA one-hot path
# (ops.table) wins.
OSC_KERNEL_MAX_WAVE = 16384
# largest timeline the gridless kernel holds in VMEM (outputs are
# 2 * T * 4 bytes dense): 2^20 samples ~ 23.7 s at 44.1 kHz -> 8 MB.
OSC_KERNEL_MAX_T = 1 << 20


def _filter_mix_math(x, row, pos, N, carry, tail):
    """Functional biquad + gain-ramp + mix for one (C, P) chunk.

    x: (C, P) oscillator samples; ``row(name)`` -> (1, P) control row;
    pos: (C, P) int32 sample positions within the MIDI block;
    carry: (2, P) filter state [y1; y2]; tail: (2, P) FIR input tail
    [x[-2]; x[-1]].  Returns (ml, mr, new_carry, new_tail) where
    ml/mr are the gain-weighted per-voice outputs (C, P) (sum over
    lanes = the stereo mix).

    Coefficients are constant per voice within a chunk (chunk divides
    the MIDI block), so the Kogge-Stone scan's transition matrices are
    powers of ONE 2x2 companion matrix per voice: the per-stage matrix
    products collapse to (1, P) scalar updates and only the state-pair
    vector update touches (C, P) data — ~2.5x fewer VPU ops than the
    general varying-coefficient scan. An epoch boundary can only land
    on the chunk's first sample (pos == 0), where it zeroes the
    incoming carry and FIR tail instead of gating transitions
    mid-chunk.
    """
    C, P = x.shape
    # epoch boundary: only possible at the chunk's first sample
    # (as 0/1 f32 — Mosaic cannot concat/slice bool vectors)
    first_f = (pos[0:1, :] == 0).astype(jnp.float32)
    ff = first_f * (row("freshf") > 0.5).astype(jnp.float32)  # (1, P)
    keep = 1.0 - ff

    tail_k = tail * keep  # boundary forgets the previous block's input
    x1 = jnp.concatenate([tail_k[1:2, :], x[: C - 1]], axis=0)
    x2 = jnp.concatenate([tail_k[0:2, :], x[: C - 2]], axis=0)
    fir = row("b0") * x + row("b1") * x1 + row("b2") * x2

    # fold the (boundary-masked) carried state into the first input:
    # u[0] += A @ c  ->  scan computes y[n] = sum A^(n-k) u[k] + A^(n+1) c
    a11 = -row("a1")
    a12 = -row("a2")
    c1 = carry[0:1, :] * keep
    c2 = carry[1:2, :] * keep
    v1 = jnp.concatenate([fir[0:1, :] + a11 * c1 + a12 * c2, fir[1:, :]], 0)
    v2 = jnp.concatenate([c1, jnp.zeros((C - 1, P), jnp.float32)], 0)

    # constant-A Kogge-Stone: per stage the matrix is A^(2^s) — four
    # (1, P) rows updated by scalar squaring; the (C, P) work is just
    # the shifted state-pair update.
    a21 = jnp.ones((1, P), jnp.float32)
    a22 = jnp.zeros((1, P), jnp.float32)
    s = 1
    while s < C:
        def sh(arr):
            top = jnp.zeros((s, P), arr.dtype)
            return jnp.concatenate([top, arr[:-s]], axis=0)

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
    new_carry = jnp.concatenate([v1[C - 1 : C, :], v2[C - 1 : C, :]], axis=0)
    new_tail = x[C - 2 : C, :]

    ramp = pos.astype(jnp.float32) * (1.0 / N)

    def gain(prev_name, cur_name):
        prev = row(prev_name)  # (1, P)
        cur = row(cur_name)
        audible = jnp.maximum(prev, cur) >= NON_AUDIBLE
        const = jnp.abs(cur - prev) < 1.0e-3
        g = jnp.where(const, cur, prev + (cur - prev) * ramp)
        return jnp.where(audible, g, 0.0)

    return gain("pgl", "gl") * y, gain("pgr", "gr") * y, new_carry, new_tail


_FILTER_ROWS = ("b0", "b1", "b2", "a1", "a2", "freshf", "pgl", "gl", "pgr", "gr")


def _chunk_pos(i, cpb, C, P):
    """(C, P) int32 sample positions within the MIDI block of chunk i."""
    return jax.lax.rem(i, jnp.int32(cpb)) * jnp.int32(
        C
    ) + jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)


def _make_kernel(N: int, chunk: int):
    cpb = N // chunk

    def kernel(xt_ref, *refs):
        row_refs = dict(zip(_FILTER_ROWS, refs[: len(_FILTER_ROWS)]))
        l_ref, r_ref, carry, tail = refs[len(_FILTER_ROWS) :]
        i = pl.program_id(0)
        # NB: i32 program id + python int promotes to i64 under
        # jax_enable_x64, which Mosaic cannot lower — pin to i32.
        blk = jax.lax.div(i, jnp.int32(cpb))

        def row(name):  # (B, P) control plane resident in VMEM -> (1, P)
            return row_refs[name][pl.ds(blk, 1), :]

        @pl.when(i == 0)
        def _init():
            carry[:] = jnp.zeros_like(carry)
            tail[:] = jnp.zeros_like(tail)

        x = xt_ref[:]
        C, P = x.shape
        pos = _chunk_pos(i, cpb, C, P)
        ml, mr, new_carry, new_tail = _filter_mix_math(
            x, row, pos, N, carry[:], tail[:]
        )
        carry[:] = new_carry
        tail[:] = new_tail
        l_ref[:] = jnp.sum(ml, axis=1, keepdims=True)
        r_ref[:] = jnp.sum(mr, axis=1, keepdims=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("N", "chunk", "interpret"))
def filter_gain_mix_pallas(xt, rows, N: int, chunk: int = 128,
                           interpret: bool = False):
    """xt: (T, P) osc output; rows: dict of (B, P) control planes
    (b0, b1, b2, a1, a2, freshf, pgl, gl, pgr, gr — gains pre-folded
    with master volume and aliveness). Returns (T, 2) float32."""
    T, P = xt.shape
    B = rows["b0"].shape[0]
    assert N % chunk == 0 and T % N == 0
    # full (B, P) plane resident in VMEM; explicit index map because the
    # default one emits x64 literals that Mosaic cannot lower
    row_spec = pl.BlockSpec(
        (B, P), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM
    )
    big_spec = pl.BlockSpec(
        (chunk, P), lambda i: (i, i * 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (chunk, 1), lambda i: (i, i * 0), memory_space=pltpu.VMEM
    )
    L, R = pl.pallas_call(
        _make_kernel(N, chunk),
        out_shape=(
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        grid=(T // chunk,),
        in_specs=[big_spec] + [row_spec] * len(_FILTER_ROWS),
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, P), jnp.float32),  # filter state carry
            pltpu.VMEM((2, P), jnp.float32),  # FIR input tail
        ],
        interpret=interpret,
    )(xt, *[rows[k] for k in _FILTER_ROWS])
    return jnp.concatenate([L, R], axis=1)


# ---- oscillator-fused variant -------------------------------------------

_OSC_F32_ROWS = ("ratio", "base_frac", "loopf", "ls_val") + _FILTER_ROWS
_OSC_I32_ROWS = ("base_int", "loop_start", "loop_len", "smp_end")


def _lane_gather(x, idx):
    """out[i, j] = x[i, idx[i, j]] with int32 indices.

    jnp.take_along_axis promotes indices to int64 under jax_enable_x64,
    which Mosaic rejects; call lax.gather directly in the exact form
    Mosaic lowers to ``tpu.dynamic_gather`` along lanes.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        x,
        idx[..., None],
        dnums,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _make_osc_kernel(N: int, chunk: int, n_chunks: int, n_rows: int,
                     L_true: int):
    cpb = N // chunk

    def kernel(w0_ref, w1_ref, *refs):
        nf, ni = len(_OSC_F32_ROWS), len(_OSC_I32_ROWS)
        row_refs = dict(zip(_OSC_F32_ROWS, refs[:nf]))
        row_refs.update(dict(zip(_OSC_I32_ROWS, refs[nf : nf + ni])))
        st_in_ref, l_ref, r_ref, st_out_ref = refs[nf + ni :]
        P = row_refs["ratio"].shape[1]
        C = chunk

        def body(i, state):
            carry, tail = state
            blk = jax.lax.div(i, jnp.int32(cpb))

            def row(name):
                return row_refs[name][pl.ds(blk, 1), :]

            pos = _chunk_pos(i, cpb, C, P)
            # ---- oscillator: same arithmetic as the XLA path ----
            steps = pos.astype(jnp.float32)
            offset = row("base_frac") + steps * row("ratio")  # (C, P)
            off_int = jnp.floor(offset)
            frac = offset - off_int
            abs_idx = row("base_int") + off_int.astype(jnp.int32)
            loop_start = row("loop_start")
            loop_len = row("loop_len")
            # loop wrap without integer mod: the base is pre-wrapped
            # into the loop, so phi >= 0 and modest; f32 reciprocal
            # with exact ±1 integer fixup.
            phi = abs_idx - loop_start
            inv_ll = 1.0 / loop_len.astype(jnp.float32)
            k = jnp.floor(phi.astype(jnp.float32) * inv_ll).astype(jnp.int32)
            w = phi - k * loop_len
            w = jnp.where(w < 0, w + loop_len, w)
            w = jnp.where(w >= loop_len, w - loop_len, w)
            looping = row("loopf") > 0.5
            idx_eff = jnp.where(looping, loop_start + w, abs_idx)
            # NB: jnp.clip promotes a weak python 0 to i64 under
            # jax_enable_x64 and Mosaic cannot cast i64 -> i32.
            i0 = jnp.minimum(
                jnp.maximum(idx_eff, jnp.int32(0)), jnp.int32(L_true - 2)
            )
            q = jax.lax.shift_right_logical(i0, jnp.int32(7))
            s = jnp.bitwise_and(i0, jnp.int32(127))
            acc0 = jnp.zeros((C, P), jnp.float32)
            acc1 = jnp.zeros((C, P), jnp.float32)
            for r in range(n_rows):
                m = q == r
                r0 = jnp.broadcast_to(w0_ref[r : r + 1, :], (C, P))
                r1 = jnp.broadcast_to(w1_ref[r : r + 1, :], (C, P))
                acc0 = jnp.where(m, _lane_gather(r0, s), acc0)
                acc1 = jnp.where(m, _lane_gather(r1, s), acc1)
            # loop-end wrap of the second lerp tap: i0+1 -> loop_start
            wrap = looping & ((i0 + 1) >= (loop_start + loop_len))
            w1v = jnp.where(wrap, row("ls_val"), acc1)
            smp = (1.0 - frac) * acc0 + frac * w1v
            valid = looping | (abs_idx < row("smp_end"))
            x = jnp.where(valid, smp, 0.0)

            ml, mr, carry, tail = _filter_mix_math(
                x, row, pos, N, carry, tail
            )
            # mix down over lanes, then lay the C samples across lanes
            # of output row i (a (T, 1) VMEM output would pad to 128
            # lanes per sample): transpose + sublane reduce.
            lrow = jnp.sum(ml.T, axis=0, keepdims=True)  # (1, C)
            rrow = jnp.sum(mr.T, axis=0, keepdims=True)
            l_ref[pl.ds(i, 1), :] = lrow
            r_ref[pl.ds(i, 1), :] = rrow
            return (carry, tail)

        carry_f, tail_f = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(n_chunks),
            body,
            (st_in_ref[0:2, :], st_in_ref[2:4, :]),
        )
        st_out_ref[:] = jnp.concatenate([carry_f, tail_f], axis=0)

    return kernel


# ---- windowed-DMA variant (arbitrary-size wavetables) --------------------

# largest timeline per kernel launch for the window variant: outputs are
# dense in VMEM and the window buffer + transposed control rows add ~4 MB.
WINDOW_KERNEL_MAX_T = 1 << 18

# Time-chunk of the windowed-DMA kernel's inner fori_loop. Values above
# 128 do NOT currently compile: the slab gather's operand/indices/out
# must all be (P, 128) (Mosaic lane-gather same-shape rule — lowering
# asserts indices.shape == operand.shape + (1,)), so a larger time
# chunk would need an inner 128-wide sub-chunk loop restructure. The
# env knob exists for future experiments.
import os as _os

WINDOW_KERNEL_CHUNK = int(_os.environ.get("PYGMU2_WINDOW_CHUNK", "128"))

_WIN_F32_T = ("ratio", "base_frac")  # (B, P) f32
_WIN_I32_T = ("base_int", "loop_start", "loop_len", "smp_end", "loopi")


def _make_window_kernel(N: int, chunk: int, B: int, W: int, align: int):
    """Gridless kernel: per-voice HBM->VMEM window DMA + osc + filter.

    Layout: control planes stay (B, P) — Mosaic can slice the SUBLANE
    dimension dynamically (``[pl.ds(blk, 1), :]``) but not the lane
    dimension, so everything vectorized runs time-major (CS, P) exactly
    like the resident kernel. The per-voice window gather, however,
    needs voices on the SUBLANE axis (operand row p = voice p's window
    slab), so the (CS, P) indices transpose to (P, CS) for the
    ``tpu.dynamic_gather`` and the gathered samples transpose back —
    i32 indices ride the f32 transpose (values < 2^24, exact).

    The windows live in a DOUBLE-BUFFERED (2·KS, P, 128) scratch so
    slab s of the live buffer is a DYNAMIC leading-dim slice
    ``win[pl.ds(bp·KS + s, 1)]``: the gather loop runs only
    [row_lo, row_hi) — per-sub-chunk bounds over all voices, computed
    outside the kernel — instead of unrolling all KS slabs. At typical
    pitch ratios a sub-chunk touches ~2-4 rows of its window, so this
    is ~20x less gather work than the full sweep (and the kernel body
    stays small enough to compile quickly).

    Window refresh is PREFETCHED one refresh-block ahead: the host
    ships per-block ``flag`` ("any voice's window moved this block")
    and ``nxt`` ("index of the next flagged block") planes; at each
    flagged block the kernel waits the DMAs issued at the PREVIOUS
    flagged block (into the spare buffer), swaps buffers, and
    immediately issues the next flagged block's windows into the
    now-free buffer — the HBM transfer rides under a full block of
    compute instead of stalling the pipeline (measured 0.9 ms of a
    3.6 ms render for a ~1M-sample font at 128 voices, all-moving).

    Refresh is PER-VOICE: a window's content depends only on its start
    ``ws`` (the wavetable is static), so a flagged block need only copy
    voices whose ws differs from what its buffer last held — with the
    two-buffer rotation that is exactly ``ws[f_k] != ws[f_{k-2}]`` over
    flagged blocks f_0 < f_1 < … (f_0/f_1 copy everything: both buffers
    start empty). The host ships the per-block moved COUNT (``cnt``)
    and a moved-first voice-id permutation (``mvl``); the issue loop
    runs cnt iterations instead of P (the scalar issue loop, not the
    hidden transfer, is the refresh cost — a bend-heavy schedule flags
    nearly every block but moves only the sounding voices), and the
    wait drains cnt one-voice-sized descriptors. Unflagged stretches
    (anchored loops, sustained notes) cost nothing.
    """
    cpb = N // chunk
    CS = chunk
    KS = W // 128
    rows_w = W // 128
    ralign = align // 128  # window start alignment in 128-lane rows

    def kernel(wave_ref, ws_smem, flag_smem, nxt_smem, cnt_smem, mvl_smem,
               lo_smem, hi_smem, *refs):
        nf, ni = len(_WIN_F32_T), len(_WIN_I32_T)
        tf = dict(zip(_WIN_F32_T, refs[:nf]))
        ti = dict(zip(_WIN_I32_T, refs[nf : nf + ni]))
        fr = dict(zip(_FILTER_ROWS, refs[nf + ni : nf + ni + len(_FILTER_ROWS)]))
        (st_in, ws_vmem, l_ref, r_ref, st_out,
         win, sem) = refs[nf + ni + len(_FILTER_ROWS) :]
        P = tf["ratio"].shape[1]

        def issue_moved(b, buf):
            """Start block b's per-voice window copies (moved voices
            only) on ONE shared DMA semaphore (DMA semaphores count
            bytes, so the batch can be drained by same-size waits)."""
            boff = buf * jnp.int32(KS)

            def issue(v, _):
                p = mvl_smem[b, v]
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

            jax.lax.fori_loop(0, cnt_smem[b], issue, 0)

        def wait_moved(b):
            """Drain block b's refresh batch in O(log P) waits: DMA
            semaphores count bytes, so a fake descriptor spanning 2^k
            voice columns counts 2^k one-voice copies — waiting one
            descriptor per set bit of cnt[b] drains exactly cnt
            copies' worth. (A serial cnt-iteration wait loop cost ~8%
            of the sustained-chord render: 91 flagged blocks × up to
            128 scalar waits; pltpu.semaphore_wait refuses DMA
            semaphores, same-size descriptors' .wait() is the idiom.)"""
            c = cnt_smem[b]
            k = 0
            while (1 << k) <= P:
                sz = 1 << k

                @pl.when(jnp.bitwise_and(c, jnp.int32(sz)) != 0)
                def _(sz=sz):
                    pltpu.make_async_copy(
                        win.at[pl.ds(0, rows_w), pl.ds(0, sz), :],
                        win.at[pl.ds(0, rows_w), pl.ds(0, sz), :],
                        sem.at[jnp.int32(0)],
                    ).wait()

                k += 1

        # prologue: block 0 is always flagged; its windows go to buf 0
        issue_moved(jnp.int32(0), jnp.int32(0))

        def osc_chunk(blk, j, bp):
            """(CS, P) oscillator samples for sub-chunk j of block blk."""

            def rowf(name):  # (1, P) f32 control row
                return tf[name][pl.ds(blk, 1), :]

            def rowi(name):  # (1, P) i32
                return ti[name][pl.ds(blk, 1), :]

            steps = (
                jax.lax.broadcasted_iota(jnp.int32, (CS, P), 0) + j * CS
            ).astype(jnp.float32)
            offset = rowf("base_frac") + steps * rowf("ratio")  # (CS, P)
            off_int = jnp.floor(offset)
            frac = offset - off_int
            abs_idx = rowi("base_int") + off_int.astype(jnp.int32)
            loop_start = rowi("loop_start")
            loop_len = rowi("loop_len")
            # in-view loop wrap (anchored voices only): same reciprocal
            # trick as the resident kernel, in view coordinates.
            phi = abs_idx - loop_start
            inv_ll = 1.0 / loop_len.astype(jnp.float32)
            k = jnp.floor(phi.astype(jnp.float32) * inv_ll).astype(jnp.int32)
            w = phi - k * loop_len
            w = jnp.where(w < 0, w + loop_len, w)
            w = jnp.where(w >= loop_len, w - loop_len, w)
            looping = rowi("loopi") > 0
            idx_eff = jnp.where(looping, loop_start + w, abs_idx)
            # window-relative index, clamped for memory safety (legit
            # reads never clamp; dead/stale voices are gain-masked)
            ws_row = ws_vmem[pl.ds(blk, 1), :]  # (1, P)
            widx = jnp.minimum(
                jnp.maximum(idx_eff - ws_row, jnp.int32(0)),
                jnp.int32(W - 2),
            )
            # voice-major for the gather: indices < 2^24 ride an exact
            # f32 transpose (Mosaic has no native i32 transpose here)
            widx_t = widx.astype(jnp.float32).T.astype(jnp.int32)  # (P, CS)
            w1_t = widx_t + 1
            q0 = jax.lax.shift_right_logical(widx_t, jnp.int32(7))
            q1 = jax.lax.shift_right_logical(w1_t, jnp.int32(7))
            c0 = jnp.bitwise_and(widx_t, jnp.int32(127))
            c1 = jnp.bitwise_and(w1_t, jnp.int32(127))
            i = blk * jnp.int32(cpb) + j
            boff = bp * jnp.int32(KS)

            def slab_body(s, accs):
                a0, a1 = accs
                slab = win[pl.ds(boff + s, 1)].reshape(P, 128)
                a0 = jnp.where(q0 == s, _lane_gather(slab, c0), a0)
                a1 = jnp.where(q1 == s, _lane_gather(slab, c1), a1)
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
            smp = (1.0 - frac) * acc0.T + frac * acc1.T  # back to (CS, P)
            valid = looping | (abs_idx < rowi("smp_end"))
            return jnp.where(valid, smp, 0.0)

        def body(i, state):
            carry, tail, bp = state
            blk = jax.lax.div(i, jnp.int32(cpb))
            j = jax.lax.rem(i, jnp.int32(cpb))

            # a flagged block consumes the prefetched buffer and issues
            # the NEXT flagged block's windows into the retired one
            flip = (j == 0) & (flag_smem[blk] != 0)
            bp = jnp.where(flip, jnp.int32(1) - bp, bp)

            @pl.when(flip)
            def _():
                wait_moved(blk)
                nr = nxt_smem[blk]

                @pl.when(nr < jnp.int32(B))
                def _():
                    issue_moved(nr, jnp.int32(1) - bp)

            x = osc_chunk(blk, j, bp)  # (CS, P)

            def row(name):
                return fr[name][pl.ds(blk, 1), :]

            pos = _chunk_pos(i, cpb, CS, P)
            ml, mr, carry, tail = _filter_mix_math(
                x, row, pos, N, carry, tail
            )
            l_ref[pl.ds(i, 1), :] = jnp.sum(ml.T, axis=0, keepdims=True)
            r_ref[pl.ds(i, 1), :] = jnp.sum(mr.T, axis=0, keepdims=True)
            return (carry, tail, bp)

        carry_f, tail_f, _bp = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(B * cpb),
            body,
            (st_in[0:2, :], st_in[2:4, :], jnp.int32(1)),
        )
        st_out[:] = jnp.concatenate([carry_f, tail_f], axis=0)

    return kernel


def _window_row_bounds(rows, W: int, cpb: int, CS: int):
    """Per-sub-chunk window-row ranges over all live voices.

    Returns (lo, hi) int32 arrays of shape (B * cpb,): the gather loop
    for sub-chunk i touches window rows [lo[i], hi[i]) only. Bounds are
    widened by one row CONDITIONALLY — only when an endpoint index sits
    within 2 samples of a 128-sample row boundary, where float32
    rounding differences between this computation and the in-kernel
    index math (≲ 0.001 samples at window magnitudes) could flip the
    row. The former unconditional ±1 widening doubled the typical gather
    span (p50 4 rows vs 2 true) and with it the kernel's slab-loop cost.
    """
    KS = W // 128
    e = lambda k: rows[k][:, None, :]  # (B, 1, P)
    ratio = jnp.asarray(e("ratio"), jnp.float32)
    base_frac = jnp.asarray(e("base_frac"), jnp.float32)
    base_int = jnp.asarray(e("base_int"), jnp.int32)
    ls = jnp.asarray(e("loop_start"), jnp.int32)
    ll = jnp.maximum(jnp.asarray(e("loop_len"), jnp.int32), 1)
    ws = jnp.asarray(e("ws"), jnp.int32)
    loopi = rows["loopf"][:, None, :] > 0.5
    alive = rows["alive"][:, None, :] > 0.5

    j = jnp.arange(cpb, dtype=jnp.float32)[None, :, None]  # (1, cpb, 1)
    o0 = jnp.floor(base_frac + (j * CS) * ratio).astype(jnp.int32)
    o1 = jnp.floor(base_frac + (j * CS + (CS - 1)) * ratio).astype(jnp.int32) + 1
    i_lo = base_int + o0
    i_hi = base_int + o1
    # anchored loops wrap in view coordinates: phase range within [0, ll)
    d = o1 - o0
    w0 = jnp.mod(i_lo - ls, ll)
    spans_wrap = (w0 + d >= ll) | (d >= ll)
    a_lo = jnp.where(spans_wrap, 0, w0)
    a_hi = jnp.where(spans_wrap, ll + 1, w0 + d)
    lo_idx = jnp.where(loopi, ls + a_lo, i_lo) - ws
    hi_idx = jnp.where(loopi, ls + a_hi, i_hi) - ws
    near_lo = jnp.bitwise_and(lo_idx, 127) <= 1
    near_hi = jnp.bitwise_and(hi_idx, 127) >= 126
    r_lo = jnp.clip(lo_idx >> 7, 0, KS - 1) - near_lo.astype(jnp.int32)
    r_hi = jnp.clip(hi_idx >> 7, 0, KS - 1) + near_hi.astype(jnp.int32)
    r_lo = jnp.where(alive, r_lo, KS)
    r_hi = jnp.where(alive, r_hi, -1)
    lo = jnp.maximum(jnp.min(r_lo, axis=2), 0)  # (B, cpb)
    hi = jnp.minimum(jnp.max(r_hi, axis=2), KS - 1) + 1  # exclusive
    return (
        lo.reshape(-1).astype(jnp.int32),
        hi.reshape(-1).astype(jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("N", "W", "align", "chunk", "interpret")
)
def osc_window_filter_gain_mix_pallas(rows, wave_ext, N: int, W: int,
                                      align: int = 128, chunk: int | None = None,
                                      interpret: bool = False, state=None):
    """Windowed-DMA fused audio pass for arbitrary-size wavetables.

    rows: dict of (B, P) control planes — the _FILTER_ROWS gains/coeffs
    plus the output of ``offline.window_osc_rows`` (ratio, base_frac,
    loopf, base_int, loop_start, loop_len, smp_end, alive, ws — view
    coordinates; ``ws`` 128-aligned window starts).
    wave_ext: (L_ext,) float32 extended wavetable (lives in HBM; only
    per-voice windows of W samples ever enter VMEM). L_ext % 128 == 0.
    Returns ((T, 2) float32, (4, P) carried filter state).
    """
    B, P = rows["ratio"].shape
    T = B * N
    if chunk is None:
        chunk = WINDOW_KERNEL_CHUNK
    chunk = math.gcd(N, min(chunk, N))
    assert chunk % 128 == 0 and W % 128 == 0 and T <= WINDOW_KERNEL_MAX_T
    L_ext = wave_ext.shape[0]
    assert L_ext % 128 == 0 and W <= L_ext
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
    # refresh plan for the prefetching kernel: flag[b] = "any voice's
    # window moved entering block b" (block 0 always), nxt[b] = index of
    # the next flagged block after b (B when none — kernel skips issue)
    moved = jnp.any(ws[1:] != ws[:-1], axis=1) if B > 1 else jnp.zeros(
        (0,), bool
    )
    flag = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), moved.astype(jnp.int32)]
    )
    idx = jnp.arange(B, dtype=jnp.int32)
    cand = jnp.where(flag > 0, idx, jnp.int32(B))
    sufmin = jnp.flip(jax.lax.cummin(jnp.flip(cand)))  # min flagged >= b
    nxt = jnp.concatenate(
        [sufmin[1:], jnp.full((1,), jnp.int32(B))]
    )  # strictly after b
    # per-voice refresh lists: with the two-buffer rotation, flagged
    # block f_k reuses the buffer last filled at f_{k-2}, and window
    # content depends only on ws — so f_k must copy exactly the voices
    # with ws[f_k] != ws[f_{k-2}] (copy-all when fewer than two flagged
    # predecessors: that buffer is still empty).
    p1 = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32),
         jax.lax.cummax(jnp.where(flag > 0, idx, jnp.int32(-1)))[:-1]]
    )  # last flagged index strictly before b (-1: none)
    p2 = jnp.where(p1 >= 0, jnp.take(p1, jnp.maximum(p1, 0)), jnp.int32(-1))
    ws_p2 = jnp.take(ws, jnp.maximum(p2, 0), axis=0)  # (B, P)
    mv = ((p2 < 0)[:, None] | (ws != ws_p2)) & (flag > 0)[:, None]
    cnt = jnp.sum(mv, axis=1).astype(jnp.int32)
    mvl = jnp.argsort(~mv, axis=1, stable=True).astype(jnp.int32)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    L, R, st_out = pl.pallas_call(
        _make_window_kernel(N, chunk, B, W, align),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((4, P), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [sspec] * 7
        + [vspec] * (len(_WIN_F32_T) + len(_WIN_I32_T) + len(_FILTER_ROWS) + 2),
        out_specs=(vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((2 * (W // 128), P, 128), jnp.float32),  # windows ×2
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(
        wave3d,
        ws,
        flag,
        nxt,
        cnt,
        mvl,
        lo,
        hi,
        *tf,
        *ti,
        *frows,
        jnp.asarray(state, jnp.float32),
        ws,  # (B, P) VMEM twin for the vectorized widx math
    )
    return jnp.stack([L.reshape(T), R.reshape(T)], axis=1), st_out


@functools.partial(
    jax.jit, static_argnames=("N", "L_true", "chunk", "interpret")
)
def osc_filter_gain_mix_pallas(rows, wave, N: int, L_true: int,
                               chunk: int = 512, interpret: bool = False,
                               state=None):
    """Fully fused audio-rate pass: oscillator + biquad + gains + mix.

    rows: dict of (B, P) control planes —
      f32: ratio, base_frac, loopf (0/1), ls_val (wave[loop_start]),
           b0 b1 b2 a1 a2, freshf, pgl gl pgr gr (gains pre-folded with
           master volume and aliveness);
      i32: base_int, loop_start, loop_len (>=1), smp_end.
    wave: (L,) float32 wavetable, L == L_true <= OSC_KERNEL_MAX_WAVE.
    state: optional (4, P) carried state [filter y1; y2; FIR x[-2];
    x[-1]] from a previous segment (timelines beyond OSC_KERNEL_MAX_T
    render as fused segments with this state threaded — see
    _audio_pass).
    Returns ((T, 2) float32, (4, P) state) with T = B * N
    (and T <= OSC_KERNEL_MAX_T).
    """
    B, P = rows["ratio"].shape
    T = B * N
    # chunk must divide the MIDI block: largest divisor of N that is
    # <= the requested chunk (block sizes like 640 pass the N % 128
    # fused-path gate but are not multiples of 512).
    chunk = math.gcd(N, min(chunk, N))
    assert N % chunk == 0 and T <= OSC_KERNEL_MAX_T
    if state is None:
        state = jnp.zeros((4, P), jnp.float32)
    n_chunks = T // chunk
    n_rows = -(-L_true // 128)
    pad = n_rows * 128 - L_true
    w0 = jnp.concatenate([wave, jnp.zeros((pad,), wave.dtype)])
    # shifted twin: w1[i] = wave[i + 1] (last entry repeats — i0 is
    # clipped to L_true - 2 so tap 1 never reads past the end)
    w1 = jnp.concatenate([wave[1:], wave[-1:], jnp.zeros((pad,), wave.dtype)])
    w0 = w0.reshape(n_rows, 128)
    w1 = w1.reshape(n_rows, 128)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    L, R, st_out = pl.pallas_call(
        _make_osc_kernel(N, chunk, n_chunks, n_rows, L_true),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, chunk), jnp.float32),
            jax.ShapeDtypeStruct((4, P), jnp.float32),
        ),
        in_specs=[vspec]
        * (3 + len(_OSC_F32_ROWS) + len(_OSC_I32_ROWS)),
        out_specs=(vspec, vspec, vspec),
        interpret=interpret,
    )(
        w0,
        w1,
        *[jnp.asarray(rows[k], jnp.float32) for k in _OSC_F32_ROWS],
        *[jnp.asarray(rows[k], jnp.int32) for k in _OSC_I32_ROWS],
        jnp.asarray(state, jnp.float32),
    )
    return jnp.stack([L.reshape(T), R.reshape(T)], axis=1), st_out
