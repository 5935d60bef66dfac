"""Block-period-parallel reverse echo for the static-parameter case.

ReversePitchEchoPE's feedback rides the double-buffered block swap: while
block k is being written, only the COMPLETED block k-1 is played back
(reference: reverse_pitch_echo_pe.py:30-716 — write head fills one
buffer while the read head replays the other). So when

* ``block_seconds`` is a static scalar whose sample count is an exact
  f32 fixed point of the one-pole smoother (any integer block length:
  the smoother update is exactly 0), and
* ``pitch_ratio`` is a static near-unity scalar (the pitch stage is
  bypassed bitwise by the kernel's own ``near_unity`` select),

the per-sample recurrence collapses to a recurrence over BLOCK PERIODS:
each period's wet output is a windowed (possibly reversed) gather from
the previous period's written block, and the written block is
``x + wet * fb`` — all elementwise in the same op order as the
sequential kernel, so every emitted sample is arithmetically identical.
One ``lax.scan`` over ~T/Lb periods with (Lb, C)-vector bodies replaces
T sequential ring-buffer steps.

Arbitrary mid-block starting state (w_idx != 0) is handled by aligning
the input to the global block grid with a dynamic roll; the first
period's already-written rows are taken from the carried buffer.

Pure jnp: every backend, natively differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("Lb", "plen", "ratio", "alternate", "unroll"),
)
def reverse_echo_aligned(
    x,
    fb,
    buf_a,
    buf_b,
    pitch_buf,
    cur_is_a,
    p_wpos,
    p_rpos,
    w_idx,
    prev_block,
    reverse,
    *,
    Lb: int,
    plen: int,
    ratio: float,
    alternate: bool,
    unroll: int = 2,
):
    """x: (T, C) f32; fb: (T,) f32; buf_a/buf_b: (cap, C) block buffers;
    pitch_buf: (plen, C). Scalars are the kernel's misc state. ``Lb`` is
    the static block length (== smoothed fixed point == cur_block).
    Requires (checked by the caller's lax.cond): smoothed == Lb,
    cur_block == Lb, w_idx == r_idx in [0, Lb), prev_block in {0, Lb}.

    Returns (wet (T, C), buf_a', buf_b', pitch_buf', cur_is_a', p_wpos',
    p_rpos', w_idx', prev_block', reverse') — r_idx' == w_idx',
    smoothed'/cur_block' are unchanged on this path.
    """
    T, C = x.shape
    nseg = -(-(T + Lb) // Lb)  # covers off + T for any off < Lb
    Tp = nseg * Lb
    off = w_idx.astype(jnp.int32)

    xf = x.astype(jnp.float32)
    xp = jnp.roll(jnp.pad(xf, ((0, Tp - T), (0, 0))), off, axis=0)
    fbp = jnp.roll(jnp.pad(fb.astype(jnp.float32), (0, Tp - T)), off)
    xb = xp.reshape(nseg, Lb, C)
    fbb = fbp.reshape(nseg, Lb, 1)

    rows = jnp.arange(Lb, dtype=jnp.int32)
    cur_rows = jnp.where(cur_is_a == 1, buf_a[:Lb], buf_b[:Lb])
    other_rows = jnp.where(cur_is_a == 1, buf_b[:Lb], buf_a[:Lb])
    # rows < seg_start were written before this render (segment 0 only)
    seg_start = jnp.zeros((nseg,), jnp.int32).at[0].set(off)

    def body(carry, xs):
        prev_rows, prev_cnt, rev = carry
        xk, fbk, start_k = xs
        # per-sample math identical to the sequential kernel's step():
        idx = jnp.where(rev == 1, prev_cnt - 1 - rows, rows)
        playing = (
            (prev_cnt > 0) & (rows < prev_cnt) & (idx >= 0) & (idx < prev_cnt)
        )
        wpos = jnp.where(
            prev_cnt > 1,
            rows.astype(jnp.float32) / jnp.maximum(prev_cnt - 1, 1),
            0.0,
        )
        window = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * wpos)
        wet_raw = jnp.take(prev_rows, jnp.clip(idx, 0, Lb - 1), axis=0)
        wet = jnp.where(playing[:, None], wet_raw * window[:, None], 0.0)
        write_val = xk + wet * fbk  # pitched == x on the near-unity path
        wv = jnp.where((rows < start_k)[:, None], cur_rows, write_val)
        rev2 = (1 - rev) if alternate else jnp.int32(1)
        return (wv, jnp.int32(Lb), rev2), (wet, wv)

    (_, _, _), (wetb, wvb) = jax.lax.scan(
        body,
        (other_rows, prev_block.astype(jnp.int32), reverse.astype(jnp.int32)),
        (xb, fbb, seg_start),
        unroll=min(nseg, unroll),
    )
    y = jax.lax.dynamic_slice(
        wetb.reshape(Tp, C), (off, jnp.int32(0)), (T, C)
    )

    # ---- final state ------------------------------------------------
    total = off + jnp.int32(T)
    nblocks = total // Lb  # completed block swaps during this render
    w_f = total - nblocks * Lb

    def seg(k):
        return jax.lax.dynamic_index_in_dim(
            wvb, jnp.clip(k, 0, nseg - 1), keepdims=False
        )

    # current buffer: rows < w_f from the partial block; the rest is what
    # the sequential kernel left there — the block written two swaps ago
    # (or the pre-render contents when fewer than two swaps happened).
    twoago = jnp.where(
        nblocks >= 2,
        seg(nblocks - 2),
        jnp.where(nblocks == 1, other_rows, cur_rows),
    )
    curbuf_rows = jnp.where((rows < w_f)[:, None], seg(nblocks), twoago)
    prevbuf_rows = jnp.where(nblocks >= 1, seg(nblocks - 1), other_rows)

    cur_is_a2 = jnp.where(nblocks % 2 == 1, 1 - cur_is_a, cur_is_a)
    a_rows = jnp.where(cur_is_a2 == 1, curbuf_rows, prevbuf_rows)
    b_rows = jnp.where(cur_is_a2 == 1, prevbuf_rows, curbuf_rows)
    buf_a2 = buf_a.at[:Lb].set(a_rows.astype(buf_a.dtype))
    buf_b2 = buf_b.at[:Lb].set(b_rows.astype(buf_b.dtype))

    prev2 = jnp.where(nblocks >= 1, jnp.int32(Lb), prev_block)
    if alternate:
        rev2 = jnp.where(nblocks % 2 == 1, 1 - reverse, reverse)
    else:
        rev2 = jnp.where(nblocks >= 1, jnp.int32(1), reverse)

    # pitch state: output never reads it on this path (near-unity select
    # is bitwise x), but keep it consistent for checkpoint/restore. The
    # buffer and write head are exact; p_rpos is the closed form of the
    # iterated f32 mod-add (ulp-level drift, phase-only effect).
    p_wpos2 = jnp.mod(p_wpos + jnp.int32(T), jnp.int32(plen))
    p_rpos2 = jnp.mod(
        p_rpos + jnp.float32(T) * jnp.float32(ratio), jnp.float32(plen)
    ).astype(jnp.float32)
    if T >= plen:
        pitch_buf2 = jnp.roll(xf[T - plen:], p_wpos2, axis=0).astype(
            pitch_buf.dtype
        )
    else:
        idxw = jnp.mod(p_wpos + jnp.arange(T, dtype=jnp.int32), plen)
        pitch_buf2 = pitch_buf.at[idxw].set(xf.astype(pitch_buf.dtype))

    return (
        y,
        buf_a2,
        buf_b2,
        pitch_buf2,
        cur_is_a2.astype(jnp.int32),
        p_wpos2.astype(jnp.int32),
        p_rpos2,
        w_f.astype(jnp.int32),
        prev2.astype(jnp.int32),
        rev2.astype(jnp.int32),
    )
