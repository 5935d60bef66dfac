"""Fractional-index gather + interpolation primitive.

TPU-native equivalent of the reference's shared interpolated-lookup kernel
(reference: src/pygmu2/interpolated_lookup.py:33-144) used by DelayPE
(fractional/modulated delay), WavetablePE, TimeWarpPE and the SoundFont
oscillator. The reference sizes its source window dynamically from the
rendered index min/max; under XLA shapes are static, so callers pull a
conservatively-sized window (e.g. from ``max_delay`` or the table extent)
and this kernel gathers into it. Out-of-window indices produce zeros.

Lookup strategy: a plain ``window[idx]`` gather lowers to a scalar loop
on TPU (~7 ns/element — see ops/table.py). Instead, the whole
interpolation stencil is fetched with ONE index decode through
``ops.table.paired_table_lookup``: the stencil's neighbor rows become
statically-shifted copies of the window (slice+concat — no gather), laid
side by side as parallel tables sharing the base index. Linear and cubic
then cost one decode regardless of stencil width.
"""

from __future__ import annotations

import jax.numpy as jnp

from pygmu2_tpu.ops.table import paired_table_lookup


def _shifted(window, k: int, wrap: bool):
    """window rows shifted so row i holds window[i+k] (clamped or wrapped
    at the edges) — static slices, no gather."""
    if k == 0:
        return window
    if wrap:
        return jnp.roll(window, -k, axis=0)
    if k > 0:
        return jnp.concatenate(
            [window[k:], jnp.repeat(window[-1:], k, axis=0)]
        )
    return jnp.concatenate(
        [jnp.repeat(window[:1], -k, axis=0), window[:k]]
    )


def _stencil(window, base, offsets, wrap: bool):
    """[window[clip/wrap(base + k)] for k in offsets] with ONE decode.

    window: (W, C); base: (T,) int32 already in [0, W). Returns a list
    over offsets of (T, C) arrays. Bit-identical to per-offset gathers
    for base in range (the shifted copies encode the edge clamp/wrap).
    """
    W, C = window.shape
    cols = [_shifted(window, k, wrap) for k in offsets]
    tables = jnp.concatenate(cols, axis=1)  # (W, len(offsets) * C)
    outs = paired_table_lookup(tables, base)
    return [
        jnp.stack(outs[j * C : (j + 1) * C], axis=1)
        for j in range(len(offsets))
    ]


def _catmull_rom(ym1, y0, y1, y2, f):
    return y0 + 0.5 * f * (
        y1
        - ym1
        + f * (2.0 * ym1 - 5.0 * y0 + 4.0 * y1 - y2 + f * (3.0 * (y0 - y1) + y2 - ym1))
    )


def interp_window(window, pos, mode: str = "linear", oob_zero: bool = True):
    """Interpolate ``window`` at fractional row positions ``pos``.

    Args:
        window: (W, C) source samples (row i is "index i").
        pos: (T,) or (T, C) fractional row indices into the window.
        mode: "linear" or "cubic" (Catmull-Rom).
        oob_zero: zero samples whose stencil would leave [0, W-1]. When
            False, out-of-range positions clamp to the edge rows (the
            interpolant is evaluated at the clamped position, so the
            edge value holds exactly).
    Returns:
        (T, C) interpolated samples.
    """
    W = window.shape[0]
    pos = jnp.asarray(pos, dtype=jnp.float32)
    if pos.ndim == 1:
        pos = pos[:, None]  # broadcast one index stream over channels

    if pos.shape[1] > 1:
        return _interp_window_per_channel(window, pos, mode, oob_zero)

    # Clamp-mode evaluates at the clamped position; zero-mode masks the
    # output later, so the base index only needs to be lookup-safe.
    pos_eval = pos if oob_zero else jnp.clip(pos, 0.0, W - 1.0)
    i0 = jnp.floor(pos_eval)
    frac = pos_eval - i0
    base = jnp.clip(i0.astype(jnp.int32), 0, W - 1)[:, 0]  # (T,)

    if mode == "linear":
        y0, y1 = _stencil(window, base, (0, 1), wrap=False)
        out = y0 + frac * (y1 - y0)
    elif mode == "cubic":
        ym1, y0, y1, y2 = _stencil(window, base, (-1, 0, 1, 2), wrap=False)
        out = _catmull_rom(ym1, y0, y1, y2, frac)
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


def _interp_window_per_channel(window, pos, mode: str, oob_zero: bool):
    """Per-channel index streams: keep the take_along_axis path (rare —
    only reached when a caller passes (T, C>1) positions)."""
    W = window.shape[0]
    pos_eval = pos if oob_zero else jnp.clip(pos, 0.0, W - 1.0)
    i0 = jnp.floor(pos_eval)
    frac = pos_eval - i0
    i0i = i0.astype(jnp.int32)

    def row(i):
        idx = jnp.clip(i, 0, W - 1)
        return jnp.take_along_axis(
            window, jnp.broadcast_to(idx, pos.shape), axis=0
        )

    if mode == "linear":
        y0 = row(i0i)
        y1 = row(i0i + 1)
        out = y0 + frac * (y1 - y0)
    elif mode == "cubic":
        out = _catmull_rom(
            row(i0i - 1), row(i0i), row(i0i + 1), row(i0i + 2), frac
        )
    else:
        raise ValueError(f"unknown interpolation mode: {mode}")

    if oob_zero:
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

    if phase.shape[1] > 1:
        def row(i):
            idx = jnp.mod(i, W)
            return jnp.take_along_axis(
                table, jnp.broadcast_to(idx, phase.shape), axis=0
            )

        if mode == "linear":
            y0, y1 = row(i0), row(i0 + 1)
            return y0 + frac * (y1 - y0)
        elif mode == "cubic":
            return _catmull_rom(
                row(i0 - 1), row(i0), row(i0 + 1), row(i0 + 2), frac
            )
        raise ValueError(f"unknown interpolation mode: {mode}")

    # mod W puts the base index in range already; shifted copies wrap.
    base = jnp.clip(i0[:, 0], 0, W - 1)
    if mode == "linear":
        y0, y1 = _stencil(table, base, (0, 1), wrap=True)
        return y0 + frac * (y1 - y0)
    elif mode == "cubic":
        ym1, y0, y1, y2 = _stencil(table, base, (-1, 0, 1, 2), wrap=True)
        return _catmull_rom(ym1, y0, y1, y2, frac)
    raise ValueError(f"unknown interpolation mode: {mode}")
