"""Pallas TPU kernel for the ADSR state machines (sequential in time).

The gated/triggered ADSR (reference: src/pygmu2/adsr_pe.py:124-193, a
per-sample Python state machine) is a data-dependent recurrence — gate
edges retarget the envelope mid-segment — so it cannot be parallelized
in time.  The ``lax.scan`` path costs ~3.8 µs/sample (float64 envelope
carry is software-emulated on TPU); this kernel runs the same machine
as a Mosaic ``fori_loop`` with the state resident in a VMEM register
tile, following the ``ops/ladder_pallas.py`` pattern.

Precision without float64: instead of accumulating ``env += dvdt`` per
sample (which drifts in f32), the state is ``(stage, e0, n)`` and the
envelope is recomputed fresh as ``env = e0 + n * dvdt`` — one f32
rounding regardless of segment length, error <= eps * |env| ~ 6e-8,
within the 1e-7 budget of the scan path's f64 carry.  Segment counts
stay exact in f32 below 2^24 samples (~380 s per segment).

State tile rows (f32, lane-broadcast): [stage, e0, n, prev_gate].
Stage codes match models.envelopes: IDLE/ATTACK/DECAY/SUSTAIN/RELEASE.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.ops.diffable import kernel_with_scan_vjp

_LANES = 128
_IDLE, _ATTACK, _DECAY, _SUSTAIN, _RELEASE = 0.0, 1.0, 2.0, 3.0, 4.0


def _make_kernel(dA: float, dD: float, dR: float, sus: float,
                 sustain_samples: int | None, chunk: int, total_rows: int):
    gated = sustain_samples is None
    # Static: does any grid step contain padded tail rows? Chunk-aligned
    # renders compile with no per-sample guard at all (the
    # ops/ladder_pallas.py pattern).
    needs_guard = total_rows % chunk != 0

    def kernel(g_ref, st_in_ref, y_ref, st_out_ref, st_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            st_ref[:] = st_in_ref[:]

        def env_of(stage, e0, n):
            d = jnp.where(
                stage == _ATTACK,
                jnp.float32(dA),
                jnp.where(stage == _DECAY, jnp.float32(dD), jnp.float32(dR)),
            )
            return jnp.where(
                stage == _IDLE,
                jnp.float32(0.0),
                jnp.where(
                    stage == _SUSTAIN, jnp.float32(sus), e0 + n * d
                ),
            )

        # The 4 machine states live in the fori_loop carry (vector
        # registers), not VMEM scratch: the body is a pure serial
        # dependency, and 8 scratch load/stores per sample sat on its
        # critical path. Scratch only carries state BETWEEN grid steps.
        def _sample(j, carry):
            stage, e0, n, pg = carry
            g = g_ref[pl.ds(j, 1), :]  # (1, 128)

            env = env_of(stage, e0, n)
            y_ref[pl.ds(j, 1), :] = env

            # --- gate/trigger retargeting (before the segment step,
            # matching the lax.scan path's op order) ---
            if gated:
                rising = (pg == 0.0) & (g == 1.0)
                falling = (pg == 1.0) & (g == 0.0)
                stage = jnp.where(
                    rising,
                    jnp.float32(_ATTACK),
                    jnp.where(falling, jnp.float32(_RELEASE), stage),
                )
                edge = rising | falling
            else:
                edge = g > 0.0
                stage = jnp.where(edge, jnp.float32(_ATTACK), stage)
            e0 = jnp.where(edge, env, e0)
            n = jnp.where(edge, jnp.float32(0.0), n)

            # --- one linear-segment step with clip transitions ---
            d2 = jnp.where(
                stage == _ATTACK,
                jnp.float32(dA),
                jnp.where(stage == _DECAY, jnp.float32(dD), jnp.float32(dR)),
            )
            n1 = n + 1.0
            cand = e0 + n1 * d2
            hit_a = (stage == _ATTACK) & (cand >= 1.0)
            hit_d = (stage == _DECAY) & (cand <= sus)
            hit_r = (stage == _RELEASE) & (cand <= 0.0)
            if gated:
                expire = jnp.zeros_like(hit_a)
            else:
                expire = (stage == _SUSTAIN) & (
                    n1 >= jnp.float32(sustain_samples)
                )
            stage2 = jnp.where(
                hit_a,
                jnp.float32(_DECAY),
                jnp.where(
                    hit_d,
                    jnp.float32(_SUSTAIN),
                    jnp.where(
                        hit_r,
                        jnp.float32(_IDLE),
                        jnp.where(expire, jnp.float32(_RELEASE), stage),
                    ),
                ),
            )
            e02 = jnp.where(
                hit_a,
                jnp.float32(1.0),
                jnp.where(
                    hit_d | expire,
                    jnp.float32(sus),
                    jnp.where(hit_r, jnp.float32(0.0), e0),
                ),
            )
            n2 = jnp.where(hit_a | hit_d | hit_r | expire, 0.0, n1)
            return (stage2, e02, n2, g)

        def body(j, carry):
            new = _sample(j, carry)
            if needs_guard:
                # Padded tail rows must not advance the machine (their
                # y rows are sliced off by the caller).
                row = i * jnp.int32(chunk) + j
                live = row < jnp.int32(total_rows)
                new = tuple(
                    jnp.where(live, n, c) for n, c in zip(new, carry)
                )
            return new

        init = tuple(st_ref[pl.ds(k, 1), :] for k in range(4))
        final = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(chunk), body, init
        )
        for k in range(4):
            st_ref[pl.ds(k, 1), :] = final[k]

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            st_out_ref[:] = st_ref[:]

    return kernel


def adsr_scan_ref(gate, state, *, dA, dD, dR, sus, sustain_samples=None):
    """Pure-jax ``lax.scan`` reference of the kernel (same op order and
    (stage, e0, n) recompute-fresh precision scheme, f32). Backward body
    of the kernel's VJP (ops/diffable.py). Same outputs as
    :func:`adsr_scan_pallas`: (env (T,), new_state (4,))."""
    gated = sustain_samples is None

    def env_of(stage, e0, n):
        d = jnp.where(
            stage == _ATTACK,
            jnp.float32(dA),
            jnp.where(stage == _DECAY, jnp.float32(dD), jnp.float32(dR)),
        )
        return jnp.where(
            stage == _IDLE,
            jnp.float32(0.0),
            jnp.where(stage == _SUSTAIN, jnp.float32(sus), e0 + n * d),
        )

    def step(st4, g):
        stage, e0, n, pg = st4[0], st4[1], st4[2], st4[3]
        env = env_of(stage, e0, n)
        if gated:
            rising = (pg == 0.0) & (g == 1.0)
            falling = (pg == 1.0) & (g == 0.0)
            stage = jnp.where(
                rising,
                jnp.float32(_ATTACK),
                jnp.where(falling, jnp.float32(_RELEASE), stage),
            )
            edge = rising | falling
        else:
            edge = g > 0.0
            stage = jnp.where(edge, jnp.float32(_ATTACK), stage)
        e0 = jnp.where(edge, env, e0)
        n = jnp.where(edge, jnp.float32(0.0), n)

        d2 = jnp.where(
            stage == _ATTACK,
            jnp.float32(dA),
            jnp.where(stage == _DECAY, jnp.float32(dD), jnp.float32(dR)),
        )
        n1 = n + 1.0
        cand = e0 + n1 * d2
        hit_a = (stage == _ATTACK) & (cand >= 1.0)
        hit_d = (stage == _DECAY) & (cand <= sus)
        hit_r = (stage == _RELEASE) & (cand <= 0.0)
        if gated:
            expire = jnp.zeros_like(hit_a)
        else:
            expire = (stage == _SUSTAIN) & (
                n1 >= jnp.float32(sustain_samples)
            )
        stage2 = jnp.where(
            hit_a,
            jnp.float32(_DECAY),
            jnp.where(
                hit_d,
                jnp.float32(_SUSTAIN),
                jnp.where(
                    hit_r,
                    jnp.float32(_IDLE),
                    jnp.where(expire, jnp.float32(_RELEASE), stage),
                ),
            ),
        )
        e02 = jnp.where(
            hit_a,
            jnp.float32(1.0),
            jnp.where(
                hit_d | expire,
                jnp.float32(sus),
                jnp.where(hit_r, jnp.float32(0.0), e0),
            ),
        )
        n2 = jnp.where(hit_a | hit_d | hit_r | expire, 0.0, n1)
        return jnp.stack([stage2, e02, n2, g]), env

    new_st, y = jax.lax.scan(
        step, state.astype(jnp.float32), gate.astype(jnp.float32),
        unroll=8,
    )
    return y, new_st


def env_of_state(state, *, dA, dD, dR, sus):
    """The envelope value implied by a [stage, e0, n, pg] state vector
    (jnp mirror of the in-kernel ``env_of``)."""
    stage, e0, n = state[0], state[1], state[2]
    d = jnp.where(
        stage == _ATTACK,
        jnp.float32(dA),
        jnp.where(stage == _DECAY, jnp.float32(dD), jnp.float32(dR)),
    )
    return jnp.where(
        stage == _IDLE,
        jnp.float32(0.0),
        jnp.where(stage == _SUSTAIN, jnp.float32(sus), e0 + n * d),
    )


@functools.partial(
    jax.jit,
    static_argnames=("dA", "dD", "dR", "sus", "sustain_samples", "chunk",
                     "interpret"),
)
def adsr_scan_pallas(gate, state, *, dA, dD, dR, sus,
                     sustain_samples=None, chunk: int = 1024,
                     interpret: bool = False):
    """gate: (T,) f32 (gate levels, or trigger magnitudes for the
    triggered variant — ``sustain_samples`` not None selects it);
    state: (4,) f32 rows [stage, e0, n, prev_gate].
    Returns (env (T,) f32, new_state (4,) f32).

    Differentiable: the forward runs the Mosaic kernel; the backward
    replays :func:`adsr_scan_ref` (ops/diffable.py). The envelope is a
    state machine over gate EDGES, so the useful cotangents flow to the
    carried state, not the gate levels."""
    (T,) = gate.shape
    Tp = -(-T // chunk) * chunk

    def kernel_branch(gate, state):
        gp = jnp.broadcast_to(
            jnp.pad(gate, (0, Tp - T))[:, None], (Tp, _LANES)
        )
        st = jnp.broadcast_to(state[:, None], (4, _LANES))

        big = pl.BlockSpec((chunk, _LANES), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
        stspec = pl.BlockSpec((4, _LANES), lambda i: (i * 0, i * 0),
                              memory_space=pltpu.VMEM)
        y, new_st = pl.pallas_call(
            _make_kernel(dA, dD, dR, sus, sustain_samples, chunk, T),
            out_shape=(
                jax.ShapeDtypeStruct((Tp, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((4, _LANES), jnp.float32),
            ),
            grid=(Tp // chunk,),
            in_specs=[big, stspec],
            out_specs=(big, stspec),
            scratch_shapes=[pltpu.VMEM((4, _LANES), jnp.float32)],
            interpret=interpret,
        )(gp, st)
        return y[:T, 0], new_st[:, 0]

    def scan_branch(gate, state):
        return adsr_scan_ref(
            gate, state, dA=dA, dD=dD, dR=dR, sus=sus,
            sustain_samples=sustain_samples,
        )

    return kernel_with_scan_vjp(kernel_branch, scan_branch)(gate, state)
