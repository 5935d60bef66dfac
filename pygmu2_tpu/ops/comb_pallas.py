"""Pallas TPU kernel for the feedback comb (sequential, ring buffer).

The comb's delay is data-dependent (a smoothed, modulatable frequency
sets the read offset each sample — reference: comb_pe.py:26-113), so it
is a nonlinear recurrence over a ring buffer. `lax.scan` pays while-loop
machinery plus a dynamic_update_slice of the whole (L, C) buffer per
sample; here the ring buffer lives in VMEM scratch and each sample is
two row accesses inside a Mosaic fori_loop.

State packing: buf (L, C) plus a (1, 128) misc row [write_pos, smoothed
frequency] (position stored as f32 — exact for L < 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.ops.diffable import kernel_with_scan_vjp

_LANES = 128


def comb_scan_ref(x, freq, fb, buf, pos, sf, *, L, sr, smooth_alpha):
    """Pure-jax ``lax.scan`` reference of the kernel (same op order,
    f32). Backward body of the kernel's VJP (ops/diffable.py) and the
    parity oracle in tests/test_comb_pallas.py. Same outputs as
    :func:`comb_scan_pallas`: (y, buf', pos', sf')."""

    def step(carry, inp):
        buf, pos, sf = carry
        xi, fi, fbi = inp
        sf = jnp.where(
            sf < 0.0, fi, sf + (fi - sf) * jnp.float32(smooth_alpha)
        )
        delay = jnp.clip(
            jnp.round(jnp.float32(sr) / jnp.maximum(sf, 1.0))
            .astype(jnp.int32),
            jnp.int32(1),
            jnp.int32(L - 1),
        )
        read = jax.lax.rem(pos - delay + jnp.int32(L), jnp.int32(L))
        delayed = jax.lax.dynamic_slice_in_dim(buf, read, 1, axis=0)[0]
        out = xi + fbi * delayed
        buf = jax.lax.dynamic_update_slice_in_dim(buf, out[None], pos, axis=0)
        pos = jax.lax.rem(pos + jnp.int32(1), jnp.int32(L))
        return (buf, pos, sf), out

    (buf, pos, sf), y = jax.lax.scan(
        step,
        (buf, jnp.asarray(pos, jnp.int32), jnp.asarray(sf, jnp.float32)),
        (x, freq.astype(jnp.float32), fb.astype(jnp.float32)),
    )
    return y, buf, pos, sf


def _make_kernel(L: int, sr: float, smooth_alpha: float, chunk: int,
                 total_rows: int):
    def kernel(x_ref, f_ref, fb_ref, buf_in, misc_in,
               y_ref, buf_out, misc_out, buf, misc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            buf[:] = buf_in[:]
            misc[:] = misc_in[:]

        def body(j, carry):
            pos, sf = carry
            row = i * jnp.int32(chunk) + j

            def process(pos, sf):
                xi = x_ref[pl.ds(j, 1), :]      # (1, 128)
                fi = f_ref[j, 0]                 # scalar
                fbi = fb_ref[j, 0]
                sf = jnp.where(
                    sf < 0.0, fi, sf + (fi - sf) * jnp.float32(smooth_alpha)
                )
                delay = jnp.clip(
                    jnp.round(jnp.float32(sr) / jnp.maximum(sf, 1.0))
                    .astype(jnp.int32),
                    jnp.int32(1),
                    jnp.int32(L - 1),
                )
                read = jax.lax.rem(pos - delay + jnp.int32(L), jnp.int32(L))
                delayed = buf[pl.ds(read, 1), :]
                out = xi + fbi * delayed
                y_ref[pl.ds(j, 1), :] = out
                buf[pl.ds(pos, 1), :] = out
                pos = jax.lax.rem(pos + jnp.int32(1), jnp.int32(L))
                return pos, sf

            valid = row < jnp.int32(total_rows)
            return jax.lax.cond(valid, process, lambda p, s: (p, s), pos, sf)

        pos0 = misc[0, 0].astype(jnp.int32)
        sf0 = misc[0, 1]
        pos, sf = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk), body, (pos0, sf0)
        )
        # scalar stores to VMEM are not supported — rebuild the row
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        misc[pl.ds(0, 1), :] = jnp.where(
            lane == 0,
            pos.astype(jnp.float32),
            jnp.where(lane == 1, sf, jnp.float32(0.0)),
        )

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            buf_out[:] = buf[:]
            misc_out[:] = misc[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("L", "sr", "smooth_alpha", "chunk", "interpret"),
)
def comb_scan_pallas(x, freq, fb, buf, pos, sf, *, L, sr, smooth_alpha,
                     chunk: int = 512, interpret: bool = False):
    """x: (T, C); freq/fb: (T,) f32; buf: (L, C); pos: () int32; sf: () f32.
    Returns (y (T, C), buf', pos', sf').

    Differentiable: the forward runs the Mosaic kernel; the backward
    replays :func:`comb_scan_ref` (ops/diffable.py)."""
    T, C = x.shape
    assert C <= _LANES
    padC = _LANES - C
    Tp = -(-T // chunk) * chunk
    padT = Tp - T

    def kernel_branch(x, freq, fb, buf, pos, sf):
        xp = jnp.pad(x, ((0, padT), (0, padC)))
        colp = lambda a: jnp.pad(
            a[:, None].astype(jnp.float32), ((0, padT), (0, 0))
        )
        bufp = jnp.pad(buf, ((0, 0), (0, padC)))
        misc = jnp.zeros((1, _LANES), jnp.float32)
        misc = misc.at[0, 0].set(pos.astype(jnp.float32))
        misc = misc.at[0, 1].set(sf)

        big = pl.BlockSpec((chunk, _LANES), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        col = pl.BlockSpec((chunk, 1), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((L, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        y, buf2, misc2 = pl.pallas_call(
            _make_kernel(L, sr, smooth_alpha, chunk, T),
            out_shape=(
                jax.ShapeDtypeStruct((Tp, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((L, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
            ),
            grid=(Tp // chunk,),
            in_specs=[big, col, col, bspec, mspec],
            out_specs=(big, bspec, mspec),
            scratch_shapes=[
                pltpu.VMEM((L, _LANES), jnp.float32),
                pltpu.VMEM((1, _LANES), jnp.float32),
            ],
            interpret=interpret,
        )(xp, colp(freq), colp(fb), bufp, misc)
        return (
            y[:T, :C],
            buf2[:, :C],
            misc2[0, 0].astype(jnp.int32),
            misc2[0, 1],
        )

    def scan_branch(x, freq, fb, buf, pos, sf):
        return comb_scan_ref(
            x, freq, fb, buf, pos, sf, L=L, sr=sr,
            smooth_alpha=smooth_alpha,
        )

    return kernel_with_scan_vjp(kernel_branch, scan_branch)(
        x, freq, fb, buf, pos, sf
    )
