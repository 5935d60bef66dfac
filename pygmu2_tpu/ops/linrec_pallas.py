"""Pallas TPU kernel for order-2 affine scans (time-varying biquads).

``jax.lax.associative_scan`` (ops.linrec.affine_scan_2) runs log2(T)
*global* passes, each streaming six (T, P) planes through HBM — ~34
full-array round trips for T = 131k. This kernel restructures the scan
as: sequential grid over time-chunks; per chunk a Kogge-Stone inclusive
scan entirely in VMEM (log2(C) register-speed passes), with the running
(s1, s2) state carried across chunks in a persistent VMEM scratch.
Every input plane is read from HBM exactly once and each output written
once.

Math (same as ops.linrec.affine_scan_2):
    s[t] = [[a11, a12], [a21, a22]][t] @ s[t-1] + [u1, u2][t]
composition of affine maps (M2, v2) . (M1, v1) = (M2 M1, M2 v1 + v2).

Used by the SoundFont offline renderer's per-voice lowpass; any
time-varying biquad/SVF over >=128 lanes can call it. Lanes must be a
multiple of 128 to be worthwhile (PE-level filters with 1-2 channels
stay on the associative-scan path).

Reference counterpart: the Numba biquad kernels
(reference: biquad_pe.py:35, svfilter_pe.py:41) — sample-serial there,
chunk-parallel here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(a11_ref, a12_ref, a21_ref, a22_ref, u1_ref, u2_ref,
                 s1_ref, s2_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    m11 = a11_ref[:]
    m12 = a12_ref[:]
    m21 = a21_ref[:]
    m22 = a22_ref[:]
    v1 = u1_ref[:]
    v2 = u2_ref[:]
    C, P = m11.shape

    # Kogge-Stone inclusive scan within the chunk: after pass s, row t
    # holds the composition of maps (t-2s, t]. Shifted-in rows are the
    # identity map so short prefixes stay exact.
    s = 1
    while s < C:
        def sh(x, fill):
            top = jnp.full((s, P), fill, x.dtype)
            return jnp.concatenate([top, x[:-s]], axis=0)

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

    c1 = carry_ref[0:1, :]  # (1, P) state entering this chunk
    c2 = carry_ref[1:2, :]
    s1 = m11 * c1 + m12 * c2 + v1
    s2 = m21 * c1 + m22 * c2 + v2
    s1_ref[:] = s1
    s2_ref[:] = s2
    carry_ref[0:1, :] = s1[C - 1 : C, :]
    carry_ref[1:2, :] = s2[C - 1 : C, :]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def affine_scan_2_pallas(a11, a12, a21, a22, u1, u2, s0=None, *,
                         chunk: int = 256, interpret: bool = False):
    """Drop-in for ops.linrec.affine_scan_2 on (T, P) float32 planes.

    P should be a multiple of 128 (lanes); T is padded to the chunk.

    Differentiable: the forward runs the Mosaic kernel; the backward
    replays ``ops.linrec.affine_scan_2`` (ops/diffable.py)."""
    from pygmu2_tpu.ops.diffable import kernel_with_scan_vjp
    from pygmu2_tpu.ops.linrec import affine_scan_2

    a11, a12, a21, a22, u1, u2 = jnp.broadcast_arrays(
        a11, a12, a21, a22, u1, u2
    )
    if s0 is None:
        return kernel_with_scan_vjp(
            lambda *a: _affine_scan_2_pallas_raw(
                *a, chunk=chunk, interpret=interpret
            ),
            lambda *a: affine_scan_2(*a),
        )(a11, a12, a21, a22, u1, u2)
    return kernel_with_scan_vjp(
        lambda *a: _affine_scan_2_pallas_raw(
            *a[:6], s0=(a[6], a[7]), chunk=chunk, interpret=interpret
        ),
        lambda *a: affine_scan_2(*a[:6], s0=(a[6], a[7])),
    )(a11, a12, a21, a22, u1, u2, s0[0], s0[1])


def _affine_scan_2_pallas_raw(a11, a12, a21, a22, u1, u2, s0=None, *,
                              chunk: int = 256, interpret: bool = False):
    if s0 is not None:
        s01, s02 = s0
        u1 = u1.at[0].add(a11[0] * s01 + a12[0] * s02)
        u2 = u2.at[0].add(a21[0] * s01 + a22[0] * s02)
    T, P = u1.shape
    Tp = -(-T // chunk) * chunk
    pad = Tp - T
    if pad:
        def padz(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad, P), x.dtype)], axis=0
            )
        a11, a12, a21, a22, u1, u2 = (
            padz(a11), padz(a12), padz(a21), padz(a22), padz(u1), padz(u2)
        )

    # NB: `lambda i: (i, 0)` fails to legalize under jax_enable_x64 — the
    # literal 0 traces as i64 while program ids are i32. `i * 0` stays i32.
    spec = pl.BlockSpec(
        (chunk, P), lambda i: (i, i * 0), memory_space=pltpu.VMEM
    )
    s1, s2 = pl.pallas_call(
        _scan_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, P), jnp.float32),
        ),
        grid=(Tp // chunk,),
        in_specs=[spec] * 6,
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.VMEM((2, P), jnp.float32)],
        interpret=interpret,
    )(a11, a12, a21, a22, u1, u2)
    return s1[:T], s2[:T]
