"""Pallas TPU kernel for the Karplus-Strong string (sequential).

One-period delay line + fractional-delay allpass with rho feedback
(reference: karplus_strong_pe.py:61-220, a per-sample Python loop).
Same sequential-kernel pattern as ops/ladder_pallas.py: the string
buffer lives in VMEM scratch, the read pointer and allpass state ride
the fori_loop carry, and `act` gates both output and state advance so
pre-t=0 rows and padded tail rows leave the string untouched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.ops.diffable import kernel_with_scan_vjp

_LANES = 128


def _make_kernel(L: int, allpass_c: float, chunk: int, total_rows: int):
    def kernel(rho_ref, act_ref, buf_in, misc_in,
               y_ref, buf_out, misc_out, buf, misc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            buf[:] = buf_in[:]
            misc[:] = misc_in[:]

        c = jnp.float32(allpass_c)

        def body(j, carry):
            r, ap_in, ap_out = carry
            row = i * jnp.int32(chunk) + j

            def process(r, ap_in, ap_out):
                rho = rho_ref[j, 0]
                act = act_ref[j, 0] > 0.5
                r_next = jax.lax.rem(r + jnp.int32(1), jnp.int32(L))
                b0 = buf[pl.ds(r, 1), :]
                b1 = buf[pl.ds(r_next, 1), :]
                out_val = rho * (b0[0, 0] + b1[0, 0]) * jnp.float32(0.5)
                new_ap_out = c * out_val + ap_in - c * ap_out
                yv = jnp.where(act, new_ap_out, jnp.float32(0.0))
                y_ref[pl.ds(j, 1), :] = jnp.broadcast_to(yv, (1, _LANES))
                buf[pl.ds(r, 1), :] = jnp.where(act, new_ap_out, b0)
                r2 = jnp.where(act, r_next, r)
                ap_in2 = jnp.where(act, out_val, ap_in)
                ap_out2 = jnp.where(act, new_ap_out, ap_out)
                return r2, ap_in2, ap_out2

            valid = row < jnp.int32(total_rows)
            return jax.lax.cond(
                valid, process, lambda r, a, b: (r, a, b), r, ap_in, ap_out
            )

        r0 = misc[0, 0].astype(jnp.int32)
        ap_in0 = misc[0, 1]
        ap_out0 = misc[0, 2]
        r, ap_in, ap_out = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk), body, (r0, ap_in0, ap_out0)
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        misc[pl.ds(0, 1), :] = jnp.where(
            lane == 0,
            r.astype(jnp.float32),
            jnp.where(lane == 1, ap_in, jnp.where(lane == 2, ap_out,
                                                  jnp.float32(0.0))),
        )

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            buf_out[:] = buf[:]
            misc_out[:] = misc[:]

    return kernel


def ks_scan_ref(rho, act, buf, r, ap_in, ap_out, *, L, allpass_c):
    """Pure-jax ``lax.scan`` reference of the kernel (same op order,
    f32). Backward body of the kernel's VJP (ops/diffable.py) and the
    parity oracle in tests/test_ks_pallas.py. Same outputs as
    :func:`ks_scan_pallas`: (y, buf', r', ap_in', ap_out')."""
    c = jnp.float32(allpass_c)

    def step(carry, inp):
        rho_eff, a = inp
        buf, rr, ai, ao = carry
        r_next = jax.lax.rem(rr + jnp.int32(1), jnp.int32(L))
        out_val = rho_eff * (buf[rr] + buf[r_next]) * 0.5
        new_ap = c * out_val + ai - c * ao
        new = (buf.at[rr].set(new_ap), r_next, out_val, new_ap)
        carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(a, n, o), new, carry
        )
        return carry, jnp.where(a, new_ap, jnp.float32(0.0))

    (buf, r, ai, ao), y = jax.lax.scan(
        step,
        (buf, jnp.asarray(r, jnp.int32), jnp.asarray(ap_in, jnp.float32),
         jnp.asarray(ap_out, jnp.float32)),
        (rho.astype(jnp.float32), act),
    )
    return y, buf, r, ai, ao


@functools.partial(
    jax.jit, static_argnames=("L", "allpass_c", "chunk", "interpret")
)
def ks_scan_pallas(rho, act, buf, r, ap_in, ap_out, *, L, allpass_c,
                   chunk: int = 512, interpret: bool = False):
    """rho: (T,) f32; act: (T,) bool; buf: (L,) f32; r: () int32;
    ap_in/ap_out: () f32. Returns (y (T,), buf', r', ap_in', ap_out').

    Differentiable: the forward runs the Mosaic kernel; the backward
    replays :func:`ks_scan_ref` (ops/diffable.py)."""
    T = rho.shape[0]
    Tp = -(-T // chunk) * chunk
    padT = Tp - T

    def kernel_branch(rho, act, buf, r, ap_in, ap_out):
        colp = lambda a: jnp.pad(
            a.astype(jnp.float32)[:, None], ((0, padT), (0, 0))
        )
        bufp = jnp.pad(buf[:, None], ((0, 0), (0, _LANES - 1)))
        misc = jnp.zeros((1, _LANES), jnp.float32)
        misc = misc.at[0, 0].set(r.astype(jnp.float32))
        misc = misc.at[0, 1].set(ap_in)
        misc = misc.at[0, 2].set(ap_out)

        big = pl.BlockSpec((chunk, _LANES), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        col = pl.BlockSpec((chunk, 1), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((L, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        y, buf2, misc2 = pl.pallas_call(
            _make_kernel(L, allpass_c, chunk, T),
            out_shape=(
                jax.ShapeDtypeStruct((Tp, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((L, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
            ),
            grid=(Tp // chunk,),
            in_specs=[col, col, bspec, mspec],
            out_specs=(big, bspec, mspec),
            scratch_shapes=[
                pltpu.VMEM((L, _LANES), jnp.float32),
                pltpu.VMEM((1, _LANES), jnp.float32),
            ],
            interpret=interpret,
        )(colp(rho), colp(act), bufp, misc)
        return (
            y[:T, 0],
            buf2[:, 0],
            misc2[0, 0].astype(jnp.int32),
            misc2[0, 1],
            misc2[0, 2],
        )

    def scan_branch(rho, act, buf, r, ap_in, ap_out):
        return ks_scan_ref(
            rho, act, buf, r, ap_in, ap_out, L=L, allpass_c=allpass_c
        )

    return kernel_with_scan_vjp(kernel_branch, scan_branch)(
        rho, act, buf, r, ap_in, ap_out
    )
