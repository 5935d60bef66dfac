"""Linear recurrence kernels (the IIR workhorse).

The reference accelerates sample-serial IIR loops with Numba kernels
(reference: biquad_pe.py:35, svfilter_pe.py:41-106, envelope_pe.py:259).
On TPU the same recurrences are *linear* (even when time-varying), so they
parallelize over the time axis with ``jax.lax.associative_scan`` on affine
maps — O(log T) depth instead of O(T), batched over channels/voices on the
VPU. This module is the shared primitive behind BiquadPE, SVFilterPE,
EnvelopePE's symmetric path, NoisePE's brown/pink filters, and
SlewLimiterPE's exponential mode.

Math: a (possibly time-varying) affine recurrence
    s[t] = A[t] @ s[t-1] + u[t]
is the composition of affine maps (A[t], u[t]); composition
    (A2, u2) ∘ (A1, u1) = (A2 @ A1, A2 @ u1 + u2)
is associative, so the prefix states are an associative scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_scan_1(a, u, s0):
    """First-order affine recurrence ``s[t] = a[t]*s[t-1] + u[t]``.

    Args:
        a: (T, ...) per-step decay (broadcastable against u).
        u: (T, ...) per-step input.
        s0: (...) initial state (state *before* step 0).

    Returns:
        s: (T, ...) states after each step.
    """
    a = jnp.broadcast_to(a, u.shape)
    u = u.at[0].add(a[0] * s0) if s0 is not None else u

    def combine(left, right):
        a1, u1 = left
        a2, u2 = right
        return a1 * a2, a2 * u1 + u2

    _, s = jax.lax.associative_scan(combine, (a, u))
    return s


def affine_scan_nd(A, u, s0):
    """D-dimensional affine recurrence ``s[t] = A[t] @ s[t-1] + u[t]``.

    Args:
        A: (T, ..., D, D) per-step transition matrices.
        u: (T, ..., D) per-step inputs.
        s0: (..., D) initial state, or None for zeros.

    Returns:
        s: (T, ..., D) states after each step.

    D == 2 (the IIR case) uses fully unrolled elementwise arithmetic —
    tiny batched matmuls lower poorly on TPU (dot_general with huge batch
    dims); as plain VPU mul/add the scan both compiles and runs fast.
    """
    if s0 is not None:
        if A.shape[-1] == 2:
            a = A[0]
            extra = jnp.stack(
                [
                    a[..., 0, 0] * s0[..., 0] + a[..., 0, 1] * s0[..., 1],
                    a[..., 1, 0] * s0[..., 0] + a[..., 1, 1] * s0[..., 1],
                ],
                axis=-1,
            )
        else:
            extra = jnp.einsum("...ij,...j->...i", A[0], s0)
        u = u.at[0].add(extra)

    if A.shape[-1] == 2:

        def combine(left, right):
            A1, u1 = left
            A2, u2 = right
            a = A2[..., 0, 0] * A1[..., 0, 0] + A2[..., 0, 1] * A1[..., 1, 0]
            b = A2[..., 0, 0] * A1[..., 0, 1] + A2[..., 0, 1] * A1[..., 1, 1]
            c = A2[..., 1, 0] * A1[..., 0, 0] + A2[..., 1, 1] * A1[..., 1, 0]
            d = A2[..., 1, 0] * A1[..., 0, 1] + A2[..., 1, 1] * A1[..., 1, 1]
            AA = jnp.stack(
                [jnp.stack([a, b], axis=-1), jnp.stack([c, d], axis=-1)],
                axis=-2,
            )
            v0 = A2[..., 0, 0] * u1[..., 0] + A2[..., 0, 1] * u1[..., 1] + u2[..., 0]
            v1 = A2[..., 1, 0] * u1[..., 0] + A2[..., 1, 1] * u1[..., 1] + u2[..., 1]
            return AA, jnp.stack([v0, v1], axis=-1)

    else:

        def combine(left, right):
            A1, u1 = left
            A2, u2 = right
            return (
                jnp.einsum("...ij,...jk->...ik", A2, A1),
                jnp.einsum("...ij,...j->...i", A2, u1) + u2,
            )

    _, s = jax.lax.associative_scan(combine, (A, u))
    return s


def biquad_filter(x, b0, b1, b2, a1, a2, zi=None):
    """Direct-form-I biquad, batched over channels, parallel over time.

        y[n] = b0·x[n] + b1·x[n−1] + b2·x[n−2] − a1·y[n−1] − a2·y[n−2]

    The FIR half vectorizes directly; the feedback half is the order-2
    affine recurrence A[n] = [[−a1, −a2], [1, 0]], u[n] = [fir[n], 0],
    solved with the associative scan. DF1 matches the reference's
    time-varying semantics exactly (coefficients apply at the output
    sample; DF2T would smear them across steps).

    Args:
        x: (T, C) input.
        b0..a2: scalars or (T,) / (T, 1) arrays (time-varying OK).
        zi: carried state dict {"x": (2, C) last two inputs [x[-1], x[-2]],
            "y": (2, C) last two outputs}, or None for zeros.

    Returns:
        (y, zf): (T, C) output and the carried state for the next block.
    """
    T, C = x.shape
    dt = x.dtype

    def tv(c):
        arr = jnp.asarray(c, dtype=dt)
        if arr.ndim == 0:
            return jnp.broadcast_to(arr, (T, 1))
        return arr.reshape(T, -1)

    b0, b1, b2, a1, a2 = tv(b0), tv(b1), tv(b2), tv(a1), tv(a2)

    if zi is None:
        x_tail = jnp.zeros((2, C), dt)
        y_tail = jnp.zeros((2, C), dt)
    else:
        x_tail = jnp.asarray(zi["x"], dt)
        y_tail = jnp.asarray(zi["y"], dt)

    # FIR half on [x[-2], x[-1], x[0..T)] — fully parallel.
    xp = jnp.concatenate([x_tail[::-1], x], axis=0)  # rows: x[-2], x[-1], x...
    fir = b0 * xp[2:] + b1 * xp[1:-1] + b2 * xp[:-2]

    zero = jnp.zeros_like(a1)
    one = jnp.ones_like(a1)
    A = jnp.stack(
        [
            jnp.stack([-a1, -a2], axis=-1),
            jnp.stack([one, zero], axis=-1),
        ],
        axis=-2,
    )
    u = jnp.stack([fir, jnp.zeros_like(fir)], axis=-1)  # (T, C, 2)
    Ab = jnp.broadcast_to(A, (T, C, 2, 2))  # A is (T, 1, 2, 2): coefs per-time
    s0 = jnp.stack([y_tail[0], y_tail[1]], axis=-1)  # (C, 2) = [y[-1], y[-2]]
    s = affine_scan_nd(Ab, u, s0)  # (T, C, 2); s[...,0] = y[n]
    y = s[..., 0]

    zf = {
        "x": jnp.stack([x[-1], x[-2] if T >= 2 else x_tail[0]], axis=0),
        "y": jnp.stack([y[-1], y[-2] if T >= 2 else y_tail[0]], axis=0),
    }
    return y, zf


def one_pole_smooth(x, coef, s0=None):
    """Exponential smoother ``y[t] = y[t-1] + coef[t]·(x[t] − y[t-1])``.

    coef may be per-sample (time-varying). Returns (y, y_final).
    """
    coef = jnp.broadcast_to(jnp.asarray(coef, x.dtype), x.shape)
    a = 1.0 - coef
    u = coef * x
    y = affine_scan_1(a, u, s0)
    return y, y[-1]
