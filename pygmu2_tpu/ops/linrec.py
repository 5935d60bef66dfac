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
    """
    if s0 is not None:
        u = u.at[0].add(jnp.einsum("...ij,...j->...i", A[0], s0))

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
    """Direct-form-II-transposed biquad, batched over channels, parallel
    over time.

        y[n] = b0·x[n] + s1[n-1]
        s1[n] = b1·x[n] − a1·y[n] + s2[n-1]
        s2[n] = b2·x[n] − a2·y[n]

    Eliminating y gives the affine state recurrence with
        A = [[−a1, 1], [−a2, 0]],  u[n] = [b1−a1·b0, b2−a2·b0]·x[n].

    Args:
        x: (T, C) input.
        b0..a2: scalars or (T,) / (T, 1) arrays (time-varying coefficients;
            the same parallel scan covers modulated filters).
        zi: (C, 2) initial DF2T state [s1, s2], or None.

    Returns:
        (y, zf): (T, C) output and (C, 2) final state.
    """
    T, C = x.shape
    dt = x.dtype

    def tv(c):
        arr = jnp.asarray(c, dtype=dt)
        if arr.ndim == 0:
            return jnp.broadcast_to(arr, (T, 1))
        return arr.reshape(T, -1)

    b0, b1, b2, a1, a2 = tv(b0), tv(b1), tv(b2), tv(a1), tv(a2)

    # A: (T, 1-or-C, 2, 2); broadcasting across channels is free.
    zero = jnp.zeros_like(a1)
    one = jnp.ones_like(a1)
    A = jnp.stack(
        [
            jnp.stack([-a1, one], axis=-1),
            jnp.stack([-a2, zero], axis=-1),
        ],
        axis=-2,
    )
    u = jnp.stack([(b1 - a1 * b0) * x, (b2 - a2 * b0) * x], axis=-1)  # (T,C,2)
    Ab = jnp.broadcast_to(A, (T, C, 2, 2))

    s0 = None if zi is None else jnp.asarray(zi, dtype=dt)
    s = affine_scan_nd(Ab, u, s0)  # (T, C, 2)

    s1_prev = jnp.concatenate(
        [
            (s0[None, :, 0] if s0 is not None else jnp.zeros((1, C), dt)),
            s[:-1, :, 0],
        ],
        axis=0,
    )
    y = b0 * x + s1_prev
    return y, s[-1]


def one_pole_smooth(x, coef, s0=None):
    """Exponential smoother ``y[t] = y[t-1] + coef[t]·(x[t] − y[t-1])``.

    coef may be per-sample (time-varying). Returns (y, y_final).
    """
    coef = jnp.broadcast_to(jnp.asarray(coef, x.dtype), x.shape)
    a = 1.0 - coef
    u = coef * x
    y = affine_scan_1(a, u, s0)
    return y, y[-1]
