"""Fused Pallas kernel: per-voice biquad + gain ramps + stereo mixdown.

Consumes the oscillator output (T, P) and the per-(block, voice) control
planes directly, and emits the final (T,) left/right mixes. Compared to
the XLA pipeline (broadcast 5 coefficient planes to (T, P), FIR, global
associative scan, 2 gain grids, 2 multiplies + lane reductions — each
materialized in HBM) this reads xt once and writes 2 x (T, 1):

- coefficients/gains stay (1, P) rows in VMEM, broadcast in registers;
- the filter scan is the blocked Kogge-Stone of ops.linrec_pallas with
  the gated-biquad structure (a21 = keep, a22 = u2 = 0) hardcoded;
- the running filter state and the 2-sample FIR tail are carried across
  chunks in persistent VMEM scratch;
- gain ramps and the stereo dot-down happen on the scan output in VMEM.

Chunk size must divide the MIDI block size N so each chunk sees exactly
one control row (chunks_per_block = N // chunk).

Reference counterpart: the per-voice block loop of
reference meltysynth/synth/voice.py (filter + mix per block) —
here one kernel pass over the whole timeline for all voices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygmu2_tpu.soundfont.params import NON_AUDIBLE


def _make_kernel(N: int, chunk: int):
    cpb = N // chunk

    def kernel(xt_ref, b0r, b1r, b2r, a1r, a2r, freshr,
               pglr, glr, pgrr, grr, l_ref, r_ref, carry, tail):
        i = pl.program_id(0)
        # NB: i32 program id + python int promotes to i64 under
        # jax_enable_x64, which Mosaic cannot lower — pin to i32.
        cpb32 = jnp.int32(cpb)
        blk = jax.lax.div(i, cpb32)  # MIDI block this chunk belongs to

        def row(ref):  # (B, P) control plane resident in VMEM -> (1, P)
            return ref[pl.ds(blk, 1), :]

        @pl.when(i == 0)
        def _init():
            carry[:] = jnp.zeros_like(carry)
            tail[:] = jnp.zeros_like(tail)

        x = xt_ref[:]  # (C, P)
        C, P = x.shape
        pos = jax.lax.rem(i, cpb32) * jnp.int32(C) + jax.lax.broadcasted_iota(
            jnp.int32, (C, P), 0
        )
        # masks as 0/1 float32 — Mosaic cannot concat/slice bool vectors
        boundary_f = (pos == 0).astype(jnp.float32) * (
            row(freshr) > 0.5
        ).astype(jnp.float32)

        x1 = jnp.concatenate([tail[1:2, :], x[: C - 1]], axis=0)
        x2 = jnp.concatenate([tail[0:2, :], x[: C - 2]], axis=0)
        b1ok = 1.0 - boundary_f
        b2ok = b1ok * jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), b1ok[: C - 1]], axis=0
        )
        fir = (
            row(b0r) * x
            + row(b1r) * (b1ok * x1)
            + row(b2r) * (b2ok * x2)
        )
        keep = b1ok
        m11 = -row(a1r) * keep
        m12 = -row(a2r) * keep
        m21 = keep
        m22 = jnp.zeros((C, P), jnp.float32)
        v1 = fir
        v2 = jnp.zeros((C, P), jnp.float32)
        m21 = jnp.broadcast_to(m21, (C, P))
        m11 = jnp.broadcast_to(m11, (C, P))
        m12 = jnp.broadcast_to(m12, (C, P))

        s = 1
        while s < C:
            def sh(arr, fill):
                top = jnp.full((s, P), fill, arr.dtype)
                return jnp.concatenate([top, arr[:-s]], axis=0)

            p11 = sh(m11, 1.0)
            p12 = sh(m12, 0.0)
            p21 = sh(m21, 0.0)
            p22 = sh(m22, 1.0)
            q1 = sh(v1, 0.0)
            q2 = sh(v2, 0.0)
            n11 = m11 * p11 + m12 * p21
            n12 = m11 * p12 + m12 * p22
            n21 = m21 * p11 + m22 * p21
            n22 = m21 * p12 + m22 * p22
            v1 = m11 * q1 + m12 * q2 + v1
            v2 = m21 * q1 + m22 * q2 + v2
            m11, m12, m21, m22 = n11, n12, n21, n22
            s *= 2

        c1 = carry[0:1, :]
        c2 = carry[1:2, :]
        y = m11 * c1 + m12 * c2 + v1
        y2 = m21 * c1 + m22 * c2 + v2
        carry[0:1, :] = y[C - 1 : C, :]
        carry[1:2, :] = y2[C - 1 : C, :]
        tail[0:1, :] = x[C - 2 : C - 1, :]
        tail[1:2, :] = x[C - 1 : C, :]

        ramp = pos.astype(jnp.float32) * (1.0 / N)

        def gain(prev_r, cur_r):
            prev = row(prev_r)  # (1, P)
            cur = row(cur_r)
            audible = jnp.maximum(prev, cur) >= NON_AUDIBLE
            const = jnp.abs(cur - prev) < 1.0e-3
            g = jnp.where(const, cur, prev + (cur - prev) * ramp)
            return jnp.where(audible, g, 0.0)

        l_ref[:] = jnp.sum(gain(pglr, glr) * y, axis=1, keepdims=True)
        r_ref[:] = jnp.sum(gain(pgrr, grr) * y, axis=1, keepdims=True)

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
    names = ("b0", "b1", "b2", "a1", "a2", "freshf", "pgl", "gl", "pgr", "gr")
    L, R = pl.pallas_call(
        _make_kernel(N, chunk),
        out_shape=(
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ),
        grid=(T // chunk,),
        in_specs=[big_spec] + [row_spec] * len(names),
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, P), jnp.float32),  # filter state carry
            pltpu.VMEM((2, P), jnp.float32),  # FIR input tail
        ],
        interpret=interpret,
    )(xt, *[rows[k] for k in names])
    return jnp.concatenate([L, R], axis=1)
