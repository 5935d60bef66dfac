"""Fractional-index gather + interpolation primitive.

TPU-native equivalent of the reference's shared interpolated-lookup kernel
(reference: src/pygmu2/interpolated_lookup.py:33-144) used by DelayPE
(fractional/modulated delay), WavetablePE, TimeWarpPE and the SoundFont
oscillator. The reference sizes its source window dynamically from the
rendered index min/max; under XLA shapes are static, so callers pull a
conservatively-sized window (e.g. from ``max_delay`` or the table extent)
and this kernel gathers into it. Out-of-window indices produce zeros.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp_window(window, pos, mode: str = "linear", oob_zero: bool = True):
    """Interpolate ``window`` at fractional row positions ``pos``.

    Args:
        window: (W, C) source samples (row i is "index i").
        pos: (T,) or (T, C) fractional row indices into the window.
        mode: "linear" or "cubic" (Catmull-Rom).
        oob_zero: zero samples whose stencil would leave [0, W-1]. When
            False, edge rows are clamped instead.

    Returns:
        (T, C) interpolated samples.
    """
    W = window.shape[0]
    pos = jnp.asarray(pos, dtype=jnp.float32)
    if pos.ndim == 1:
        pos = pos[:, None]  # broadcast one index stream over channels

    i0 = jnp.floor(pos)
    frac = pos - i0
    i0i = i0.astype(jnp.int32)

    def row(i):
        idx = jnp.clip(i, 0, W - 1)
        if pos.shape[1] == 1:
            return window[idx[:, 0]]
        return jnp.take_along_axis(window, jnp.broadcast_to(idx, pos.shape), axis=0)

    if mode == "linear":
        y0 = row(i0i)
        y1 = row(i0i + 1)
        out = y0 + frac * (y1 - y0)
        lo, hi = 0.0, W - 1.0
    elif mode == "cubic":
        ym1 = row(i0i - 1)
        y0 = row(i0i)
        y1 = row(i0i + 1)
        y2 = row(i0i + 2)
        f = frac
        # Catmull-Rom spline through the 4-point stencil.
        out = y0 + 0.5 * f * (
            y1
            - ym1
            + f * (2.0 * ym1 - 5.0 * y0 + 4.0 * y1 - y2 + f * (3.0 * (y0 - y1) + y2 - ym1))
        )
        lo, hi = 1.0, W - 2.0
    else:
        raise ValueError(f"unknown interpolation mode: {mode}")

    if oob_zero:
        # The reference zero-masks any index whose value lies outside the
        # valid source range (interpolated_lookup.py:90-144). Use the
        # *linear* validity range for both modes so edge samples survive
        # cubic lookups (the stencil clamps).
        valid = (pos >= 0.0) & (pos <= W - 1.0)
        out = jnp.where(valid, out, 0.0)
    return out


def wrap_interp(table, phase, mode: str = "linear"):
    """Periodic-table lookup: ``phase`` in table rows, wrapped modulo W.

    Used by wavetable oscillators. phase: (T,) or (T, C) fractional rows.
    """
    W = table.shape[0]
    phase = jnp.asarray(phase, dtype=jnp.float32)
    if phase.ndim == 1:
        phase = phase[:, None]
    p = jnp.mod(phase, W)
    i0 = jnp.floor(p).astype(jnp.int32)
    frac = (p - jnp.floor(p)).astype(table.dtype)

    def row(i):
        idx = jnp.mod(i, W)
        if phase.shape[1] == 1:
            return table[idx[:, 0]]
        return jnp.take_along_axis(table, jnp.broadcast_to(idx, phase.shape), axis=0)

    if mode == "linear":
        y0 = row(i0)
        y1 = row(i0 + 1)
        return y0 + frac * (y1 - y0)
    elif mode == "cubic":
        ym1, y0, y1, y2 = row(i0 - 1), row(i0), row(i0 + 1), row(i0 + 2)
        f = frac
        return y0 + 0.5 * f * (
            y1
            - ym1
            + f * (2.0 * ym1 - 5.0 * y0 + 4.0 * y1 - y2 + f * (3.0 * (y0 - y1) + y2 - ym1))
        )
    raise ValueError(f"unknown interpolation mode: {mode}")
