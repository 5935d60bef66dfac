"""Pallas TPU kernel for the reverse pitch echo (sequential, ring state).

The CCRMA reverse echo (reference: src/pygmu2/reverse_pitch_echo_pe.py:
30-270, a Numba kernel) is a per-sample state machine over three ring
buffers: a short pitch-shifter delay line (dual read heads) and two
block buffers (write current / replay previous reversed under a Hann
window, with feedback). ``lax.scan`` pays a dynamic_update_slice of the
full buffers per sample; here all three buffers live in VMEM scratch
and each sample is a handful of row accesses inside a Mosaic fori_loop
(the ``ops/comb_pallas.py`` pattern).

VMEM bounds the block-buffer capacity: the kernel path engages when
``(2*cap + pitch_len) * 512 B`` fits (cap <= ~9500 rows, i.e.
``max_delay_seconds`` <= ~0.2 s at 44.1 kHz); larger capacities fall
back to the lax.scan path in models.reverse_echo.

Scalar state rides a (1, 128) misc row (f32 — integers exact < 2^24):
[cur_is_a, p_wpos, p_rpos, w_idx, r_idx, smoothed, cur_block,
prev_block, reverse].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.ops.diffable import kernel_with_scan_vjp

_LANES = 128
MISC_FIELDS = (
    "cur_is_a", "p_wpos", "p_rpos", "w_idx", "r_idx", "smoothed",
    "cur_block", "prev_block", "reverse",
)


def _make_kernel(sr: float, plen: int, cap: int, min_block: int,
                 max_block: int, smooth_alpha: float, chunk: int,
                 total_rows: int):
    inv_plen = 1.0 / plen
    half = plen / 2.0

    def kernel(x_ref, blk_ref, rat_ref, fb_ref, alt_ref,
               ba_in, bb_in, pb_in, misc_in,
               y_ref, ba_out, bb_out, pb_out, misc_out,
               ba, bb, pb, misc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            ba[:] = ba_in[:]
            bb[:] = bb_in[:]
            pb[:] = pb_in[:]
            misc[:] = misc_in[:]

        def body(j, carry):
            (cur_is_a, p_wpos, p_rpos, w_idx, r_idx, smoothed,
             cur_block, prev_block, reverse) = carry
            row = i * jnp.int32(chunk) + j

            def process(cur_is_a, p_wpos, p_rpos, w_idx, r_idx, smoothed,
                        cur_block, prev_block, reverse):
                xi = x_ref[pl.ds(j, 1), :]      # (1, 128)
                blk = blk_ref[j, 0]
                ratio = rat_ref[j, 0]
                fb = fb_ref[j, 0]
                alt = alt_ref[j, 0]

                t = blk * jnp.float32(sr)
                t = jnp.where(t != t, jnp.float32(min_block), t)  # NaN
                target = jnp.round(
                    jnp.clip(t, jnp.float32(min_block),
                             jnp.float32(max_block))
                )
                smoothed = smoothed + (target - smoothed) * jnp.float32(
                    smooth_alpha
                )
                cur_block = jnp.where(
                    w_idx == 0,
                    jnp.clip(
                        jnp.round(smoothed), jnp.float32(min_block),
                        jnp.float32(max_block),
                    ).astype(jnp.int32),
                    cur_block,
                )

                # --- pitch shifter: write, dual-head read ---
                pb[pl.ds(p_wpos, 1), :] = xi
                p_wpos = jax.lax.rem(p_wpos + jnp.int32(1), jnp.int32(plen))

                pos = p_rpos - jnp.floor(p_rpos * jnp.float32(inv_plen)) * plen
                i0 = jnp.floor(pos).astype(jnp.int32)
                i0 = jnp.clip(i0, jnp.int32(0), jnp.int32(plen - 1))
                i1 = jax.lax.rem(i0 + jnp.int32(1), jnp.int32(plen))
                frac = pos - i0.astype(jnp.float32)
                pos2 = pos + jnp.float32(half)
                pos2 = pos2 - jnp.floor(pos2 * jnp.float32(inv_plen)) * plen
                i2 = jnp.floor(pos2).astype(jnp.int32)
                i2 = jnp.clip(i2, jnp.int32(0), jnp.int32(plen - 1))
                i3 = jax.lax.rem(i2 + jnp.int32(1), jnp.int32(plen))
                frac2 = pos2 - i2.astype(jnp.float32)
                dist = jnp.abs(p_rpos - p_wpos.astype(jnp.float32))
                dist = jnp.where(
                    dist > jnp.float32(half), jnp.float32(plen) - dist, dist
                )
                f = dist * jnp.float32(1.0 / half)
                s1 = (1.0 - frac) * pb[pl.ds(i0, 1), :] + frac * pb[
                    pl.ds(i1, 1), :
                ]
                s2 = (1.0 - frac2) * pb[pl.ds(i2, 1), :] + frac2 * pb[
                    pl.ds(i3, 1), :
                ]
                pitched = f * s1 + (1.0 - f) * s2
                near_unity = jnp.abs(ratio - 1.0) < 1e-4
                pitched = jnp.where(near_unity, xi, pitched)
                p_rpos = p_rpos + ratio
                p_rpos = (
                    p_rpos - jnp.floor(p_rpos * jnp.float32(inv_plen)) * plen
                )

                # --- reverse playback of the previous block ---
                idx = jnp.where(
                    reverse == 1, prev_block - 1 - r_idx, r_idx
                )
                playing = (
                    (prev_block > 0) & (r_idx < prev_block)
                    & (idx >= 0) & (idx < prev_block)
                )
                wpos = jnp.where(
                    prev_block > 1,
                    r_idx.astype(jnp.float32)
                    / jnp.maximum(prev_block - 1, 1).astype(jnp.float32),
                    jnp.float32(0.0),
                )
                window = 0.5 - 0.5 * jnp.cos(
                    jnp.float32(2.0 * 3.14159265358979323846) * wpos
                )
                rrow = jnp.clip(idx, jnp.int32(0), jnp.int32(cap - 1))
                wet_a = ba[pl.ds(rrow, 1), :]
                wet_b = bb[pl.ds(rrow, 1), :]
                wet_raw = jnp.where(cur_is_a == 1, wet_b, wet_a)
                wet = jnp.where(playing, wet_raw * window, jnp.float32(0.0))
                y_ref[pl.ds(j, 1), :] = wet

                # --- write into the current block with feedback ---
                write_val = pitched + wet * fb

                @pl.when(cur_is_a == 1)
                def _wa():
                    ba[pl.ds(w_idx, 1), :] = write_val

                @pl.when(cur_is_a == 0)
                def _wb():
                    bb[pl.ds(w_idx, 1), :] = write_val

                # --- advance; swap buffers when the block completes ---
                w_idx = w_idx + 1
                r_idx = r_idx + 1
                done = w_idx >= cur_block
                cur_is_a = jnp.where(done, 1 - cur_is_a, cur_is_a)
                prev_block = jnp.where(done, cur_block, prev_block)
                reverse = jnp.where(
                    done,
                    jnp.where(alt >= 0.5, 1 - reverse, jnp.int32(1)),
                    reverse,
                )
                w_idx = jnp.where(done, jnp.int32(0), w_idx)
                r_idx = jnp.where(done, jnp.int32(0), r_idx)
                return (cur_is_a, p_wpos, p_rpos, w_idx, r_idx, smoothed,
                        cur_block, prev_block, reverse)

            return jax.lax.cond(
                row < jnp.int32(total_rows),
                process,
                lambda *a: a,
                cur_is_a, p_wpos, p_rpos, w_idx, r_idx, smoothed,
                cur_block, prev_block, reverse,
            )

        init = (
            misc[0, 0].astype(jnp.int32),   # cur_is_a
            misc[0, 1].astype(jnp.int32),   # p_wpos
            misc[0, 2],                      # p_rpos (f32)
            misc[0, 3].astype(jnp.int32),   # w_idx
            misc[0, 4].astype(jnp.int32),   # r_idx
            misc[0, 5],                      # smoothed (f32)
            misc[0, 6].astype(jnp.int32),   # cur_block
            misc[0, 7].astype(jnp.int32),   # prev_block
            misc[0, 8].astype(jnp.int32),   # reverse
        )
        out = jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk), body, init)
        # scalar stores to VMEM are unsupported — rebuild the misc row
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        vals = [
            out[0].astype(jnp.float32), out[1].astype(jnp.float32),
            out[2], out[3].astype(jnp.float32), out[4].astype(jnp.float32),
            out[5], out[6].astype(jnp.float32), out[7].astype(jnp.float32),
            out[8].astype(jnp.float32),
        ]
        acc = jnp.zeros((1, _LANES), jnp.float32)
        for k, v in enumerate(vals):
            acc = jnp.where(lane == k, v, acc)
        misc[pl.ds(0, 1), :] = acc

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            ba_out[:] = ba[:]
            bb_out[:] = bb[:]
            pb_out[:] = pb[:]
            misc_out[:] = misc[:]

    return kernel


def reverse_echo_scan_ref(x, blk, ratio, fb, alt, buf_a, buf_b,
                          pitch_buf, misc, *, sr, plen, cap, min_block,
                          max_block, smooth_alpha):
    """Pure-jax ``lax.scan`` reference of the kernel (same op order,
    f32). Backward body of the kernel's VJP (ops/diffable.py). Same
    signature/outputs as :func:`reverse_echo_scan_pallas` (minus the
    chunk/interpret knobs)."""
    inv_plen = 1.0 / plen
    half = plen / 2.0
    i32 = jnp.int32
    f32 = jnp.float32

    def step(carry, inp):
        ba, bb, pb, st = carry
        (cur_is_a, p_wpos, p_rpos, w_idx, r_idx, smoothed,
         cur_block, prev_block, reverse) = st
        xi, blk_, ratio_, fb_, alt_ = inp

        t = blk_ * f32(sr)
        t = jnp.where(t != t, f32(min_block), t)  # NaN guard
        target = jnp.round(jnp.clip(t, f32(min_block), f32(max_block)))
        smoothed = smoothed + (target - smoothed) * f32(smooth_alpha)
        cur_block = jnp.where(
            w_idx == 0,
            jnp.clip(
                jnp.round(smoothed), f32(min_block), f32(max_block)
            ).astype(i32),
            cur_block,
        )

        # --- pitch shifter: write, dual-head read ---
        pb = jax.lax.dynamic_update_slice_in_dim(pb, xi[None], p_wpos, 0)
        p_wpos = jax.lax.rem(p_wpos + i32(1), i32(plen))

        pos = p_rpos - jnp.floor(p_rpos * f32(inv_plen)) * plen
        i0 = jnp.clip(jnp.floor(pos).astype(i32), i32(0), i32(plen - 1))
        i1 = jax.lax.rem(i0 + i32(1), i32(plen))
        frac = pos - i0.astype(f32)
        pos2 = pos + f32(half)
        pos2 = pos2 - jnp.floor(pos2 * f32(inv_plen)) * plen
        i2 = jnp.clip(jnp.floor(pos2).astype(i32), i32(0), i32(plen - 1))
        i3 = jax.lax.rem(i2 + i32(1), i32(plen))
        frac2 = pos2 - i2.astype(f32)
        dist = jnp.abs(p_rpos - p_wpos.astype(f32))
        dist = jnp.where(dist > f32(half), f32(plen) - dist, dist)
        f = dist * f32(1.0 / half)
        row = lambda b, k: jax.lax.dynamic_slice_in_dim(b, k, 1, 0)[0]
        s1 = (1.0 - frac) * row(pb, i0) + frac * row(pb, i1)
        s2 = (1.0 - frac2) * row(pb, i2) + frac2 * row(pb, i3)
        pitched = f * s1 + (1.0 - f) * s2
        near_unity = jnp.abs(ratio_ - 1.0) < 1e-4
        pitched = jnp.where(near_unity, xi, pitched)
        p_rpos = p_rpos + ratio_
        p_rpos = p_rpos - jnp.floor(p_rpos * f32(inv_plen)) * plen

        # --- reverse playback of the previous block ---
        idx = jnp.where(reverse == 1, prev_block - 1 - r_idx, r_idx)
        playing = (
            (prev_block > 0) & (r_idx < prev_block)
            & (idx >= 0) & (idx < prev_block)
        )
        wpos = jnp.where(
            prev_block > 1,
            r_idx.astype(f32)
            / jnp.maximum(prev_block - 1, 1).astype(f32),
            f32(0.0),
        )
        window = 0.5 - 0.5 * jnp.cos(
            f32(2.0 * 3.14159265358979323846) * wpos
        )
        rrow = jnp.clip(idx, i32(0), i32(cap - 1))
        wet_raw = jnp.where(cur_is_a == 1, row(bb, rrow), row(ba, rrow))
        wet = jnp.where(playing, wet_raw * window, f32(0.0))

        # --- write into the current block with feedback ---
        write_val = pitched + wet * fb_
        new_a = jnp.where(cur_is_a == 1, write_val, row(ba, w_idx))
        new_b = jnp.where(cur_is_a == 1, row(bb, w_idx), write_val)
        ba = jax.lax.dynamic_update_slice_in_dim(ba, new_a[None], w_idx, 0)
        bb = jax.lax.dynamic_update_slice_in_dim(bb, new_b[None], w_idx, 0)

        # --- advance; swap buffers when the block completes ---
        w_idx = w_idx + 1
        r_idx = r_idx + 1
        done = w_idx >= cur_block
        cur_is_a = jnp.where(done, 1 - cur_is_a, cur_is_a)
        prev_block = jnp.where(done, cur_block, prev_block)
        reverse = jnp.where(
            done, jnp.where(alt_ >= 0.5, 1 - reverse, i32(1)), reverse
        )
        w_idx = jnp.where(done, i32(0), w_idx)
        r_idx = jnp.where(done, i32(0), r_idx)
        st = (cur_is_a, p_wpos, p_rpos, w_idx, r_idx, smoothed,
              cur_block, prev_block, reverse)
        return (ba, bb, pb, st), wet

    st0 = (
        misc[0].astype(i32), misc[1].astype(i32), misc[2].astype(f32),
        misc[3].astype(i32), misc[4].astype(i32), misc[5].astype(f32),
        misc[6].astype(i32), misc[7].astype(i32), misc[8].astype(i32),
    )
    cols = lambda a: a.astype(f32)
    (ba, bb, pb, st), y = jax.lax.scan(
        step,
        (buf_a, buf_b, pitch_buf, st0),
        (x, cols(blk), cols(ratio), cols(fb), cols(alt)),
    )
    misc2 = jnp.stack([
        st[0].astype(f32), st[1].astype(f32), st[2],
        st[3].astype(f32), st[4].astype(f32), st[5],
        st[6].astype(f32), st[7].astype(f32), st[8].astype(f32),
    ])
    return y, ba, bb, pb, misc2


@functools.partial(
    jax.jit,
    static_argnames=("sr", "plen", "cap", "min_block", "max_block",
                     "smooth_alpha", "chunk", "interpret"),
)
def reverse_echo_scan_pallas(x, blk, ratio, fb, alt, buf_a, buf_b,
                             pitch_buf, misc, *, sr, plen, cap, min_block,
                             max_block, smooth_alpha, chunk: int = 512,
                             interpret: bool = False):
    """x: (T, C); blk/ratio/fb/alt: (T,) f32 per-sample controls
    (fb pre-clipped, ratio pre-floored like the scan path);
    buf_a/buf_b: (cap, C); pitch_buf: (plen, C); misc: (9,) f32 in
    MISC_FIELDS order. Returns (wet (T, C), buf_a', buf_b',
    pitch_buf', misc').

    Differentiable: the forward runs the Mosaic kernel; the backward
    replays :func:`reverse_echo_scan_ref` (ops/diffable.py)."""
    T, C = x.shape
    assert C <= _LANES
    padC = _LANES - C
    Tp = -(-T // chunk) * chunk
    padT = Tp - T

    def kernel_branch(x, blk, ratio, fb, alt, buf_a, buf_b, pitch_buf,
                      misc):
        xp = jnp.pad(x, ((0, padT), (0, padC)))
        colp = lambda a: jnp.pad(
            a[:, None].astype(jnp.float32), ((0, padT), (0, 0))
        )
        pad_buf = lambda b: jnp.pad(b, ((0, 0), (0, padC)))
        miscp = jnp.pad(misc.astype(jnp.float32), (0, _LANES - 9))[None, :]

        big = pl.BlockSpec((chunk, _LANES), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        col = pl.BlockSpec((chunk, 1), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((cap, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        pspec = pl.BlockSpec((plen, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        y, ba2, bb2, pb2, misc2 = pl.pallas_call(
            _make_kernel(sr, plen, cap, min_block, max_block, smooth_alpha,
                         chunk, T),
            out_shape=(
                jax.ShapeDtypeStruct((Tp, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((cap, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((cap, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((plen, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
            ),
            grid=(Tp // chunk,),
            in_specs=[big, col, col, col, col, bspec, bspec, pspec, mspec],
            out_specs=(big, bspec, bspec, pspec, mspec),
            scratch_shapes=[
                pltpu.VMEM((cap, _LANES), jnp.float32),
                pltpu.VMEM((cap, _LANES), jnp.float32),
                pltpu.VMEM((plen, _LANES), jnp.float32),
                pltpu.VMEM((1, _LANES), jnp.float32),
            ],
            interpret=interpret,
        )(xp, colp(blk), colp(ratio), colp(fb), colp(alt),
          pad_buf(buf_a), pad_buf(buf_b), pad_buf(pitch_buf), miscp)
        return y[:T, :C], ba2[:, :C], bb2[:, :C], pb2[:, :C], misc2[0, :9]

    def scan_branch(x, blk, ratio, fb, alt, buf_a, buf_b, pitch_buf, misc):
        return reverse_echo_scan_ref(
            x, blk, ratio, fb, alt, buf_a, buf_b, pitch_buf, misc,
            sr=sr, plen=plen, cap=cap, min_block=min_block,
            max_block=max_block, smooth_alpha=smooth_alpha,
        )

    return kernel_with_scan_vjp(kernel_branch, scan_branch)(
        x, blk, ratio, fb, alt, buf_a, buf_b, pitch_buf, misc
    )
