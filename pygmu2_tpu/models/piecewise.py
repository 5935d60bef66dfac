"""PiecewisePE — breakpoint curves.

TPU-native rebuild of the reference PiecewisePE (reference:
src/pygmu2/piecewise_pe.py:47-235): a (sample_index, value) breakpoint
curve with STEP / LINEAR / EXPONENTIAL / SIGMOID / CONSTANT_POWER
transitions and ExtendMode edge behavior.

The reference vectorizes per segment (piecewise_pe.py / OPTIMIZING.md);
here the whole curve is one fused gather: ``searchsorted`` maps absolute
times to segment indices, and every transition shape evaluates as a
vectorized select — no per-segment loop, so a thousand-point automation
curve costs the same per sample as a two-point ramp.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent, ExtendMode
from pygmu2_tpu.core.processing_element import SourcePE
from pygmu2_tpu.models.modes import TransitionType


def _parse_points(points: Sequence[Tuple[int, float]]):
    if not points:
        raise ValueError("PiecewisePE requires at least one point")
    pts = sorted((int(t), float(v)) for t, v in points)
    # Duplicate times: later value wins.
    dedup: dict[int, float] = {}
    for t, v in pts:
        dedup[t] = v
    times = np.array(sorted(dedup), dtype=np.int64)
    values = np.array([dedup[t] for t in sorted(dedup)], dtype=np.float64)
    return times, values


class PiecewisePE(SourcePE):
    """Breakpoint curve source; one fused select over segments."""

    def __init__(
        self,
        points: Sequence[Tuple[int, float]],
        transition_type: TransitionType | str = TransitionType.LINEAR,
        extend_mode: ExtendMode = ExtendMode.ZERO,
        channels: int = 1,
    ):
        self._times, self._values = _parse_points(points)
        self._n = len(self._times)
        if isinstance(transition_type, str):
            try:
                transition_type = TransitionType(transition_type.lower())
            except ValueError:
                transition_type = TransitionType.LINEAR
        self._transition_type = transition_type
        self._extend_mode = extend_mode
        self._channels = int(channels)
        if self._channels < 1:
            raise ValueError(f"channels must be >= 1, got {self._channels}")

    @property
    def points(self) -> List[Tuple[int, float]]:
        return list(zip(self._times.tolist(), self._values.tolist()))

    @property
    def transition_type(self) -> TransitionType:
        return self._transition_type

    @property
    def extend_mode(self) -> ExtendMode:
        return self._extend_mode

    def channel_count(self) -> int:
        return self._channels

    def _compute_extent(self) -> Extent:
        if self._extend_mode != ExtendMode.ZERO:
            return Extent(None, None)
        t0 = int(self._times[0])
        t_last = int(self._times[-1])
        if self._n == 1:
            return Extent(t0, t0 + 1)
        return Extent(t0, t_last)

    def _curve(self, frac, v0, v1):
        """Vectorized transition curve on frac∈[0,1) between v0 and v1."""
        mode = self._transition_type
        if mode == TransitionType.STEP:
            return v0
        if mode == TransitionType.LINEAR:
            return v0 + (v1 - v0) * frac
        if mode == TransitionType.EXPONENTIAL:
            # Geometric glide only when both endpoints share a positive sign;
            # otherwise fall back to linear (reference rule).
            ok = (v0 > 0) & (v1 > 0)
            safe_v0 = jnp.where(ok, v0, 1.0)
            safe_v1 = jnp.where(ok, v1, 1.0)
            geo = safe_v0 * (safe_v1 / safe_v0) ** frac
            return jnp.where(ok, geo, v0 + (v1 - v0) * frac)
        if mode == TransitionType.SIGMOID:
            x = jnp.clip(6.0 * (2.0 * frac - 1.0), -20.0, 20.0)
            sig = 1.0 / (1.0 + jnp.exp(-x))
            return v0 + (v1 - v0) * sig
        if mode == TransitionType.CONSTANT_POWER:
            # Rising pairs use sin, falling use 1−cos: fade pairs sum to
            # constant power.
            rise = jnp.sin(0.5 * jnp.pi * frac)
            fall = 1.0 - jnp.cos(0.5 * jnp.pi * frac)
            curve = jnp.where(v1 >= v0, rise, fall)
            return v0 + (v1 - v0) * curve
        return v0 + (v1 - v0) * frac

    def _trace(self, ctx):
        t = ctx.times(prec.WIDE)
        times = jnp.asarray(self._times, dtype=prec.WIDE)
        values = jnp.asarray(self._values, dtype=prec.WIDE)
        t0 = float(self._times[0])
        t_last = float(self._times[-1])

        if self._n == 1:
            out = jnp.full_like(t, float(self._values[0]))
        else:
            seg = jnp.clip(
                jnp.searchsorted(times, t, side="right") - 1, 0, self._n - 2
            )
            v0 = values[seg]
            v1 = values[seg + 1]
            seg_t0 = times[seg]
            seg_t1 = times[seg + 1]
            frac = jnp.clip((t - seg_t0) / (seg_t1 - seg_t0), 0.0, 1.0)
            out = self._curve(frac, v0, v1)

        hold_first = self._extend_mode in (ExtendMode.HOLD_FIRST, ExtendMode.HOLD_BOTH)
        hold_last = self._extend_mode in (ExtendMode.HOLD_LAST, ExtendMode.HOLD_BOTH)
        before = t < t0
        after = t > t_last if self._n == 1 else t >= t_last
        out = jnp.where(before, float(self._values[0]) if hold_first else 0.0, out)
        out = jnp.where(after, float(self._values[-1]) if hold_last else 0.0, out)

        out = out.astype(prec.AUDIO)[:, None]
        if self._channels > 1:
            out = jnp.tile(out, (1, self._channels))
        return out

    def __repr__(self) -> str:
        return (
            f"PiecewisePE(n_points={self._n}, "
            f"transition={self._transition_type.value}, "
            f"extend={self._extend_mode.value})"
        )
