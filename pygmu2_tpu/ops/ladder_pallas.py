"""Pallas TPU kernel for the Moog ladder filter (sequential in time).

The ladder's tanh feedback makes it a *nonlinear* per-sample recurrence
(reference: ladder_pe.py:31-203, a Numba kernel) — it cannot be
parallelized in time. `lax.scan` pays ~2.4 µs/sample of while-loop
overhead on TPU even fully unrolled; this kernel runs the same body as
a Mosaic `fori_loop` over samples with the 9 filter states resident in
a VMEM scratch register tile, so each sample costs VPU-op time instead
of loop machinery.

Channels ride the 128 lanes (C is padded up); the grid is sequential
over time chunks with state carried in scratch. Bit-compatible with the
`lax.scan` path in models.physical.LadderPE (same op order, f32).
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


def _mode_mix(mode_index: int, u, s1, s2, s3, s4):
    if mode_index == 0:
        return s4
    if mode_index == 1:
        return s2
    if mode_index == 2:
        return (s2 + s4) * 4.0 - s3 * 8.0
    if mode_index == 3:
        return (s1 - s2) * 2.0
    if mode_index == 4:
        return u + s4 - (s1 + s3) * 4.0 + s2 * 6.0
    return u + s2 - s1 * 2.0


def ladder_scan_ref(x, al, qa, ki, dsc, state, *, os_n, pbg, mode_index,
                    input_threshold, state_decay):
    """Pure-jax ``lax.scan`` reference of the kernel (same op order, f32;
    kernel layout: x (T, C), al/qa/ki/dsc (T,), state (9, C)). Backward
    body of the kernel's VJP (ops/diffable.py) and the parity oracle in
    tests/test_ladder_pallas.py."""
    os_recip = 1.0 / os_n

    def step(st9, inp):
        xi, al_, qa_, ki_, dsc_ = inp
        input_sample = xi * dsc_
        quiet = jnp.abs(input_sample) < input_threshold
        decay = jnp.where(
            quiet, jnp.float32(state_decay), jnp.float32(1.0)
        )
        z0 = [st9[k] * decay for k in range(4)]
        z1 = [st9[4 + k] * decay for k in range(4)]
        old = st9[8] * decay
        total = jnp.zeros_like(input_sample)
        for s_idx in range(os_n):
            interp = s_idx * os_recip
            in_i = interp * old + (1.0 - interp) * input_sample
            u = jnp.tanh(in_i - (z1[3] - pbg * in_i) * ki_ * qa_)
            stages = []
            prev = u
            for st_i in range(4):
                ft = prev * 0.76923077 + 0.23076923 * z0[st_i] - z1[st_i]
                ft = ft * al_ + z1[st_i]
                z1[st_i] = ft
                z0[st_i] = prev
                stages.append(ft)
                prev = ft
            total = total + _mode_mix(mode_index, u, *stages) * os_recip
        new9 = jnp.stack(z0 + z1 + [input_sample])
        return new9, total

    new_st, y = jax.lax.scan(
        step, state,
        (x, al.astype(jnp.float32), qa.astype(jnp.float32),
         ki.astype(jnp.float32), dsc.astype(jnp.float32)),
        unroll=8,
    )
    return y, new_st


def _make_kernel(os_n: int, pbg: float, mode_index: int,
                 input_threshold: float, state_decay: float, chunk: int,
                 total_rows: int):
    os_recip = 1.0 / os_n
    # Static: does any grid step contain padded tail rows? (total_rows is
    # known at trace time, so chunk-aligned renders — the engine's usual
    # 16384-sample blocks — compile with no per-sample guard at all.)
    needs_guard = total_rows % chunk != 0

    def mode_mix(u, s1, s2, s3, s4):
        return _mode_mix(mode_index, u, s1, s2, s3, s4)

    def kernel(x_ref, al_ref, qa_ref, ki_ref, dsc_ref, st_in_ref,
               y_ref, st_out_ref, st_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            st_ref[:] = st_in_ref[:]

        # The 9 filter states live in the fori_loop carry — vector
        # registers — not VMEM scratch: the per-sample body is pure
        # serial dependency, and 18 scratch load/stores per sample were
        # a third of its critical path. Scratch only carries state
        # BETWEEN grid steps (one load + one store per chunk). 8-sample
        # inner unroll (ops/slew_pallas.py pattern): one tile load/store
        # per trip for each stream, so the remaining cost is the serial
        # tanh+stage chain itself (see the floor analysis in
        # BENCHMARKS.md).
        init = tuple(st_ref[pl.ds(k, 1), :] for k in range(9))

        def body(jb, carry):
            j = jb * jnp.int32(_UNROLL)
            xb = x_ref[pl.ds(j, _UNROLL), :]      # (UNROLL, 128)
            alb = al_ref[pl.ds(j, _UNROLL), :]    # (UNROLL, 1) broadcasts
            qab = qa_ref[pl.ds(j, _UNROLL), :]
            kib = ki_ref[pl.ds(j, _UNROLL), :]
            dscb = dsc_ref[pl.ds(j, _UNROLL), :]

            outs = []
            for k in range(_UNROLL):
                z0 = list(carry[0:4])
                z1 = list(carry[4:8])
                old = carry[8]

                xi = xb[k : k + 1, :]
                al = alb[k : k + 1, :]
                qa = qab[k : k + 1, :]
                ki = kib[k : k + 1, :]
                dsc = dscb[k : k + 1, :]

                input_sample = xi * dsc
                quiet = jnp.abs(input_sample) < input_threshold
                # pin to f32: where(bool, weak, weak) makes f64 under x64
                decay = jnp.where(
                    quiet, jnp.float32(state_decay), jnp.float32(1.0)
                )

                z0 = [z * decay for z in z0]
                z1 = [z * decay for z in z1]
                old = old * decay

                total = jnp.zeros_like(input_sample)
                for s_idx in range(os_n):
                    interp = s_idx * os_recip
                    in_i = interp * old + (1.0 - interp) * input_sample
                    u = jnp.tanh(in_i - (z1[3] - pbg * in_i) * ki * qa)
                    stages = []
                    prev = u
                    for st_i in range(4):
                        ft = prev * 0.76923077 + 0.23076923 * z0[st_i] - z1[st_i]
                        ft = ft * al + z1[st_i]
                        z1[st_i] = ft
                        z0[st_i] = prev
                        stages.append(ft)
                        prev = ft
                    total = total + mode_mix(u, *stages) * os_recip

                outs.append(total)
                new = (*z0, *z1, input_sample)
                if needs_guard:
                    # Padded tail rows must not advance the filter state
                    # (their y rows are sliced off by the caller). All
                    # index math pinned to i32 (x64 promotion breaks
                    # Mosaic).
                    row = i * jnp.int32(chunk) + j + jnp.int32(k)
                    live = row < jnp.int32(total_rows)
                    new = tuple(
                        jnp.where(live, n, c) for n, c in zip(new, carry)
                    )
                carry = new
            y_ref[pl.ds(j, _UNROLL), :] = jnp.concatenate(outs, axis=0)
            return carry

        final = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk // _UNROLL), body, init
        )
        for k in range(9):
            st_ref[pl.ds(k, 1), :] = final[k]

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            st_out_ref[:] = st_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("os_n", "pbg", "mode_index", "input_threshold",
                     "state_decay", "chunk", "interpret"),
)
def ladder_scan_pallas(x, al, qa, ki, dsc, state, *, os_n, pbg, mode_index,
                       input_threshold, state_decay, chunk: int = 512,
                       interpret: bool = False):
    """x: (T, C) f32; al/qa/ki/dsc: (T,) f32 per-sample coefficients;
    state: (9, C) f32 rows = z0[0..3], z1[0..3], old.
    Returns (y (T, C), new_state (9, C)).

    Differentiable: the forward runs the Mosaic kernel; the backward
    replays :func:`ladder_scan_ref` (ops/diffable.py)."""
    T, C = x.shape
    assert C <= _LANES
    padC = _LANES - C
    Tp = -(-T // chunk) * chunk
    padT = Tp - T

    def kernel_branch(x, al, qa, ki, dsc, state):
        def pad2(a):
            return jnp.pad(a, ((0, padT), (0, padC)))

        xp = pad2(x)
        colp = lambda a: jnp.pad(a[:, None], ((0, padT), (0, 0)))
        st = jnp.pad(state, ((0, 0), (0, padC)))

        big = pl.BlockSpec((chunk, _LANES), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        col = pl.BlockSpec((chunk, 1), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        stspec = pl.BlockSpec((9, _LANES), lambda i: (i * 0, i * 0),
                              memory_space=pltpu.VMEM)
        y, new_st = pl.pallas_call(
            _make_kernel(os_n, pbg, mode_index, input_threshold,
                         state_decay, chunk, T),
            out_shape=(
                jax.ShapeDtypeStruct((Tp, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((9, _LANES), jnp.float32),
            ),
            grid=(Tp // chunk,),
            in_specs=[big, col, col, col, col, stspec],
            out_specs=(big, stspec),
            scratch_shapes=[pltpu.VMEM((9, _LANES), jnp.float32)],
            interpret=interpret,
        )(xp, colp(al), colp(qa), colp(ki), colp(dsc), st)
        return y[:T, :C], new_st[:, :C]

    def scan_branch(x, al, qa, ki, dsc, state):
        return ladder_scan_ref(
            x, al, qa, ki, dsc, state, os_n=os_n, pbg=pbg,
            mode_index=mode_index, input_threshold=input_threshold,
            state_decay=state_decay,
        )

    return kernel_with_scan_vjp(kernel_branch, scan_branch)(
        x, al, qa, ki, dsc, state
    )
