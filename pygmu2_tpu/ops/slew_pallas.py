"""Pallas TPU kernel for the slew limiter (sequential in time).

The two-sided rate limiter ``y[n] = clamp(x[n], y[n-1]-F, y[n-1]+R)``
(reference: src/pygmu2/slew_limiter_pe.py:36-118, per-sample Python) is
a genuinely serial nonlinear recurrence: the per-step map has slopes
{1, 0, 1}, and compositions of such maps grow staircase plateaus, so —
unlike the saturating accumulator (ops/linrec.clamp_accum_scan) or the
affine scans — no fixed-size associative form exists. What CAN be
bought is per-sample cost: this kernel runs the recurrence as a Mosaic
``fori_loop`` with the value in vector registers (the
``ops/adsr_pallas.py`` pattern) and an 8-sample inner unroll, so each
loop trip loads/stores one (8, 128) tile instead of eight (1, 128)
rows and the serial critical path is just the ~3-op clamp chain.

Both PE modes compile to the same kernel shape:
- LINEAR:      y = y + clip(x - y, -F, R)
- EXPONENTIAL: y = y + k(err) * err,  k = rise_k if err > 0 else fall_k
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.ops.diffable import kernel_with_scan_vjp

_LANES = 128
_UNROLL = 8


def _step(xi, cur, linear, p_rise, p_fall):
    # p_rise / p_fall arrive as python floats and become scalar
    # literals here (a jnp constant created OUTSIDE the kernel body
    # would be a captured tracer, which pallas_call rejects).
    if linear:
        return cur + jnp.clip(xi - cur, -jnp.float32(p_fall), jnp.float32(p_rise))
    err = xi - cur
    return cur + jnp.where(err > 0, jnp.float32(p_rise), jnp.float32(p_fall)) * err


def _make_kernel(linear: bool, p_rise: float, p_fall: float,
                 chunk: int, total_rows: int):
    needs_guard = total_rows % chunk != 0
    pr = float(p_rise)
    pf = float(p_fall)

    def kernel(x_ref, st_in_ref, y_ref, st_out_ref, st_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            st_ref[:] = st_in_ref[:]

        def body(jb, cur):
            j = jb * _UNROLL
            blk = x_ref[pl.ds(j, _UNROLL), :]  # (UNROLL, 128)
            outs = []
            for k in range(_UNROLL):
                nxt = _step(blk[k : k + 1, :], cur, linear, pr, pf)
                if needs_guard:
                    row = i * jnp.int32(chunk) + j + jnp.int32(k)
                    nxt = jnp.where(row < jnp.int32(total_rows), nxt, cur)
                cur = nxt
                outs.append(cur)
            y_ref[pl.ds(j, _UNROLL), :] = jnp.concatenate(outs, axis=0)
            return cur

        final = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk // _UNROLL), body,
            st_ref[0:1, :],
        )
        st_ref[0:1, :] = final

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            st_out_ref[:] = st_ref[:]

    return kernel


def slew_scan_ref(x, cur0, *, linear, p_rise, p_fall):
    """Pure-jax ``lax.scan`` reference (same op order, f32). Backward
    body of the kernel's VJP and the non-TPU fallback. Returns
    (y (T,), final (,))."""
    pr = float(p_rise)
    pf = float(p_fall)

    def step(cur, xi):
        nxt = _step(xi, cur, linear, pr, pf)
        return nxt, nxt

    final, y = jax.lax.scan(
        step, jnp.asarray(cur0, jnp.float32), x.astype(jnp.float32),
        unroll=16,
    )
    return y, final


@functools.partial(
    jax.jit,
    static_argnames=("linear", "p_rise", "p_fall", "chunk", "interpret"),
)
def slew_scan_pallas(x, cur0, *, linear, p_rise, p_fall,
                     chunk: int = 1024, interpret: bool = False):
    """x: (T,) f32 input; cur0: scalar f32 carried value.
    Returns (y (T,) f32, final scalar f32).

    Differentiable: kernel forward, scan-replay backward
    (ops/diffable.kernel_with_scan_vjp)."""
    (T,) = x.shape
    Tp = -(-T // chunk) * chunk

    def kernel_branch(x, cur0):
        xp = jnp.broadcast_to(jnp.pad(x, (0, Tp - T))[:, None], (Tp, _LANES))
        st = jnp.broadcast_to(
            jnp.asarray(cur0, jnp.float32).reshape(1, 1), (1, _LANES)
        )
        big = pl.BlockSpec((chunk, _LANES), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        stspec = pl.BlockSpec((1, _LANES), lambda i: (i * 0, i * 0),
                              memory_space=pltpu.VMEM)
        y, new_st = pl.pallas_call(
            _make_kernel(linear, p_rise, p_fall, chunk, T),
            out_shape=(
                jax.ShapeDtypeStruct((Tp, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
            ),
            grid=(Tp // chunk,),
            in_specs=[big, stspec],
            out_specs=(big, stspec),
            scratch_shapes=[pltpu.VMEM((1, _LANES), jnp.float32)],
            interpret=interpret,
        )(xp, st)
        return y[:T, 0], new_st[0, 0]

    def scan_branch(x, cur0):
        return slew_scan_ref(
            x, cur0, linear=linear, p_rise=p_rise, p_fall=p_fall
        )

    return kernel_with_scan_vjp(kernel_branch, scan_branch)(x, cur0)
