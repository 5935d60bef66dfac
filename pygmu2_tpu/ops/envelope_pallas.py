"""Pallas TPU kernel for the asymmetric envelope follower.

The attack/release follower with attack != release is a data-dependent
per-sample recurrence (the coefficient switches on the comparison
x > env — reference: envelope_pe.py:259-271, `_envelope_ar_numba`).
The symmetric case is a linear one-pole and stays on the parallel
affine scan; this kernel handles the asymmetric case as a Mosaic
``fori_loop`` with the envelope resident in VMEM scratch
(the ``ops/ladder_pallas.py`` pattern), channels riding the lanes.
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


def envelope_ar_scan_ref(x, env0, *, atk, rel):
    """Pure-jax ``lax.scan`` reference of the kernel (same op order,
    f32). Backward body of the kernel's VJP (ops/diffable.py). Same
    outputs as :func:`envelope_ar_pallas`: (env (T, C), env_final (C,))."""

    def step(e, xi):
        coeff = jnp.where(xi > e, jnp.float32(atk), jnp.float32(rel))
        e = e + coeff * (xi - e)
        return e, e

    ef, y = jax.lax.scan(step, env0.astype(jnp.float32), x, unroll=8)
    return y, ef


def _make_kernel(atk: float, rel: float, chunk: int, total_rows: int):
    # Static: does any grid step contain padded tail rows? Chunk-aligned
    # renders compile with no per-sample guard at all (the
    # ops/ladder_pallas.py pattern).
    needs_guard = total_rows % chunk != 0

    def kernel(x_ref, env_in, y_ref, env_out, env):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            env[:] = env_in[:]

        # The envelope lives in the fori_loop carry (vector registers),
        # not VMEM scratch: the body is a pure serial dependency and the
        # per-sample scratch load+store sat on its critical path.
        # Scratch only carries state BETWEEN grid steps. 8-sample inner
        # unroll (the ops/slew_pallas.py pattern): one (8, 128) tile
        # load/store per trip instead of eight (1, 128) rows, so the
        # serial path is just the compare+fma chain.
        def body(jb, e):
            j = jb * jnp.int32(_UNROLL)
            blk = x_ref[pl.ds(j, _UNROLL), :]  # (UNROLL, 128)
            outs = []
            for k in range(_UNROLL):
                xi = blk[k : k + 1, :]
                coeff = jnp.where(
                    xi > e, jnp.float32(atk), jnp.float32(rel)
                )
                new = e + coeff * (xi - e)
                if needs_guard:
                    # Padded tail rows must not advance the envelope
                    # (their y rows are sliced off by the caller).
                    row = i * jnp.int32(chunk) + j + jnp.int32(k)
                    new = jnp.where(row < jnp.int32(total_rows), new, e)
                e = new
                outs.append(e)
            y_ref[pl.ds(j, _UNROLL), :] = jnp.concatenate(outs, axis=0)
            return e

        final = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk // _UNROLL), body,
            env[pl.ds(0, 1), :],
        )
        env[pl.ds(0, 1), :] = final

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            env_out[:] = env[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("atk", "rel", "chunk", "interpret")
)
def envelope_ar_pallas(x, env0, *, atk, rel, chunk: int = 1024,
                       interpret: bool = False):
    """x: (T, C) rectified input; env0: (C,) carried envelope.
    Returns (env (T, C), env_final (C,)).

    Differentiable: the forward runs the Mosaic kernel; the backward
    replays :func:`envelope_ar_scan_ref` (ops/diffable.py)."""
    T, C = x.shape
    assert C <= _LANES
    padC = _LANES - C
    Tp = -(-T // chunk) * chunk

    def kernel_branch(x, env0):
        xp = jnp.pad(x, ((0, Tp - T), (0, padC)))
        e0 = jnp.pad(env0, (0, padC))[None, :]

        big = pl.BlockSpec((chunk, _LANES), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        espec = pl.BlockSpec((1, _LANES), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM)
        y, ef = pl.pallas_call(
            _make_kernel(atk, rel, chunk, T),
            out_shape=(
                jax.ShapeDtypeStruct((Tp, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
            ),
            grid=(Tp // chunk,),
            in_specs=[big, espec],
            out_specs=(big, espec),
            scratch_shapes=[pltpu.VMEM((1, _LANES), jnp.float32)],
            interpret=interpret,
        )(xp, e0)
        return y[:T, :C], ef[0, :C]

    def scan_branch(x, env0):
        return envelope_ar_scan_ref(x, env0, atk=atk, rel=rel)

    return kernel_with_scan_vjp(kernel_branch, scan_branch)(x, env0)
