"""PiecewisePE — breakpoint curves.

TPU-native rebuild of the reference PiecewisePE (reference:
src/pygmu2/piecewise_pe.py:47-235): a (sample_index, value) breakpoint
curve with STEP / LINEAR / EXPONENTIAL / SIGMOID / CONSTANT_POWER
transitions and ExtendMode edge behavior.

The reference vectorizes per segment (piecewise_pe.py / OPTIMIZING.md);
here the segment pick is ONE matmul on the MXU: a (T, n_seg) one-hot
membership matrix (built from f32 comparisons against block-anchored
breakpoint times) contracted with a per-segment payload matrix
[v0, v1, t0, 1/len] at ``Precision.HIGHEST`` (the default bf16 matmul
passes would round the payload). Measured on a v5e through the full
engine this runs ~190x faster than the former f64
``searchsorted``+gather formulation (6 -> ~1150 Msamples/s for a
99-point curve, `benchmarks/benchmark_pes.py`) at <=1e-6 error: XLA lowers
per-sample gathers poorly on TPU, while a tall-skinny f32 matmul is
native. Block anchoring keeps the f32 comparisons exact whenever a
breakpoint is within 2^24 samples (~6.3 min) of the rendered block;
beyond that the pick degrades gracefully by a few samples. Curves with
more than ``_MATMUL_MAX_POINTS`` breakpoints fall back to the
``searchsorted`` path (a (T, n) one-hot would stop being tiny).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent, ExtendMode
from pygmu2_tpu.core.processing_element import SourcePE
from pygmu2_tpu.models.modes import TransitionType

import jax

# Above this many breakpoints the (T, n_seg) one-hot matrix stops being
# negligible; fall back to searchsorted+gather.
_MATMUL_MAX_POINTS = 1024


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
        T = ctx.duration
        start = jnp.asarray(ctx.start, dtype=prec.INDEX)
        # Block-anchored times: in-block offsets are small exact f32 ints;
        # breakpoint offsets are exact while within 2^24 of the block.
        rel = jnp.arange(T, dtype=jnp.float32)
        times_rel = (
            jnp.asarray(self._times, dtype=prec.INDEX) - start
        ).astype(jnp.float32)

        if self._n == 1:
            out = jnp.full((T,), float(self._values[0]), jnp.float32)
        elif self._n <= _MATMUL_MAX_POINTS:
            out = self._trace_onehot(rel, times_rel)
        else:
            out = self._trace_searchsorted(ctx)

        hold_first = self._extend_mode in (ExtendMode.HOLD_FIRST, ExtendMode.HOLD_BOTH)
        hold_last = self._extend_mode in (ExtendMode.HOLD_LAST, ExtendMode.HOLD_BOTH)
        before = rel < times_rel[0]
        after = rel > times_rel[-1] if self._n == 1 else rel >= times_rel[-1]
        out = jnp.where(before, float(self._values[0]) if hold_first else 0.0, out)
        out = jnp.where(after, float(self._values[-1]) if hold_last else 0.0, out)

        out = out.astype(prec.AUDIO)[:, None]
        if self._channels > 1:
            out = jnp.tile(out, (1, self._channels))
        return out

    def _trace_onehot(self, rel, times_rel):
        """Segment pick as one MXU matmul (see module docstring)."""
        values = jnp.asarray(self._values, dtype=jnp.float32)
        # 1/len computed from exact integer lengths on the host.
        inv_len = jnp.asarray(
            1.0 / (self._times[1:] - self._times[:-1]), dtype=jnp.float32
        )
        payload = jnp.stack(
            [values[:-1], values[1:], times_rel[:-1], inv_len], axis=1
        )  # (n-1, 4)
        if self._n == 2:
            onehot = jnp.ones((rel.shape[0], 1), jnp.float32)
        else:
            ge = (rel[:, None] >= times_rel[None, 1:-1]).astype(jnp.float32)
            onehot = jnp.concatenate(
                [1.0 - ge[:, :1], ge[:, :-1] - ge[:, 1:], ge[:, -1:]], axis=1
            )  # (T, n-1); rows sum to 1, clamped to first/last segment
        p = jnp.matmul(
            onehot, payload, precision=jax.lax.Precision.HIGHEST
        )
        frac = jnp.clip((rel - p[:, 2]) * p[:, 3], 0.0, 1.0)
        return self._curve(frac, p[:, 0], p[:, 1])

    def _trace_searchsorted(self, ctx):
        """Gather formulation for very large curves (> _MATMUL_MAX_POINTS)."""
        t = ctx.times(prec.WIDE)
        times = jnp.asarray(self._times, dtype=prec.WIDE)
        values = jnp.asarray(self._values, dtype=prec.WIDE)
        seg = jnp.clip(
            jnp.searchsorted(times, t, side="right") - 1, 0, self._n - 2
        )
        v0 = values[seg]
        v1 = values[seg + 1]
        seg_t0 = times[seg]
        seg_t1 = times[seg + 1]
        frac = jnp.clip((t - seg_t0) / (seg_t1 - seg_t0), 0.0, 1.0)
        return self._curve(frac, v0, v1).astype(jnp.float32)

    def __repr__(self) -> str:
        return (
            f"PiecewisePE(n_points={self._n}, "
            f"transition={self._transition_type.value}, "
            f"extend={self._extend_mode.value})"
        )
