"""Block-parallel feedback comb for CONSTANT delay (the common case).

When CombPE's frequency is a static scalar, the one-pole smoother is a
fixed point: from the fresh-state sentinel (sf < 0) the smoothed
frequency becomes exactly ``f`` at the first sample and stays bitwise
``f`` forever (``f + (f - f) * alpha == f`` in f32), so the delay
``d = clip(round(sr / f), 1, L-1)`` is a compile-time constant
(reference: comb_pe.py:26-349 — per-sample smoothing; the constant-
frequency steady state is identical).

With constant ``d`` the recurrence ``y[n] = x[n] + fb[n] * y[n - d]``
has dependence distance exactly ``d``: a block of ``d`` consecutive
samples depends only on the previous block. The whole comb collapses to
``y_k = x_k + fb_k * y_{k-1}`` over (d, C) blocks — ONE fused
multiply-add per block instead of ``d`` sequential ring-buffer steps.
Each sample still computes ``x + fb * delayed`` in the same operation
order as the sequential kernel (ops/comb_pallas.py), so the result is
arithmetically identical sample-for-sample: no reassociation, bitwise
partition-independent (chunked == oneshot).

Pure jnp (no Pallas): runs on every backend and differentiates
natively. Measured on a v5e: CombPE 6 -> hundreds of Msamples/s/chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("d", "L", "unroll"))
def comb_const_delay(x, fb, buf, pos, *, d: int, L: int, unroll: int = 4):
    """x: (T, C) f32; fb: (T,) f32; buf: (L, C) ring of past outputs;
    pos: () int32 write head. Constant integer delay ``d`` (1 <= d < L).
    Returns (y (T, C), buf', pos') — the smoothed-frequency state is the
    caller's (it is a bitwise constant on this path).
    """
    T, C = x.shape
    assert 1 <= d < L
    nb = -(-T // d)
    Tp = nb * d

    # history window: the last d outputs, chronological (oldest first) —
    # exactly the samples y[-d..-1] the first block reads.
    idx0 = jnp.mod(pos - d + jnp.arange(d, dtype=jnp.int32), L)
    w0 = jnp.take(buf, idx0, axis=0)  # (d, C)

    xb = jnp.pad(x, ((0, Tp - T), (0, 0))).reshape(nb, d, C)
    fbb = jnp.pad(fb, (0, Tp - T)).reshape(nb, d, 1)

    def body(w, inp):
        xk, fbk = inp
        # same per-sample op order as the sequential kernel:
        # out = xi + fbi * delayed
        y = xk + fbk * w
        return y, y

    _, yb = jax.lax.scan(body, w0, (xb, fbb), unroll=min(nb, unroll))
    y = yb.reshape(Tp, C)[:T]

    pos2 = jnp.mod(pos + jnp.int32(T), jnp.int32(L))
    if T >= L:
        # every ring slot was overwritten; slot of y[T-L] is
        # (pos + T - L) mod L == pos2, so the tail rolls into place.
        buf2 = jnp.roll(y[T - L:], pos2, axis=0)
    else:
        idxw = jnp.mod(pos + jnp.arange(T, dtype=jnp.int32), L)
        buf2 = buf.at[idxw].set(y)
    return y, buf2, pos2
