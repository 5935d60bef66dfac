"""RandomPE — random control-signal source (sample/hold, interpolated,
random walk), optionally re-seeded by a trigger input.

The reference ships this PE only as a disabled draft
(reference: src/pygmu2/random_pe.py-disabled:73 — its tests importorskip),
so this is a superset of the active reference surface. The TPU design
avoids the draft's stateful host RNG entirely:

- Clocked modes (no trigger) are PURE functions of the absolute sample
  index: segment k = floor(t * rate / sr), value(k) = counter-hash(seed,
  k) (:func:`pygmu2_tpu.ops.noise.white_uniform`) — block-invariant,
  fan-out legal, and fully vectorized on device.
- LINEAR interpolates between segment values; SMOOTH uses the cubic
  smoothstep 3f²−2f³ (C¹-continuous at segment boundaries).
- WALK is a genuinely sequential bounded random walk (reflected at the
  range edges) and runs as a ``lax.scan`` with engine state carry, like
  brown noise (models/noise.py:120).
- With a ``trigger`` input, a new value is drawn on each positive
  trigger sample; the value stream is a hash of the CUMULATIVE trigger
  count, so only the count is carried across blocks (chunked == oneshot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement, SourcePE
from pygmu2_tpu.models.modes import RandomMode
from pygmu2_tpu.ops.noise import white_uniform

_LANE = 11  # decorrelate RandomPE streams from NoisePE streams


class RandomPE(SourcePE):
    """Random control signal in ``[min_value, max_value]``, mono, infinite.

    Args:
        rate: new values per second (clocked modes; ignored when a
            trigger drives the PE).
        min_value / max_value: output range.
        mode: ``RandomMode`` — SAMPLE_HOLD, LINEAR, SMOOTH, or WALK.
        seed: stream seed; None uses seed 0 (deterministic by design —
            stateless hashes are how TPU streams stay reproducible).
        trigger: optional trigger PE; each positive sample draws a new
            value (SAMPLE_HOLD/LINEAR/SMOOTH hold it; WALK takes a step).
        step_size: WALK step scale as a fraction of the range.
    """

    def __init__(
        self,
        rate: float = 1.0,
        min_value: float = 0.0,
        max_value: float = 1.0,
        mode: RandomMode = RandomMode.SAMPLE_HOLD,
        seed: int | None = None,
        trigger: ProcessingElement | None = None,
        step_size: float = 0.1,
    ):
        if rate <= 0:
            raise ValueError(f"RandomPE rate must be > 0, got {rate}")
        if max_value < min_value:
            raise ValueError("RandomPE requires max_value >= min_value")
        if step_size <= 0:
            raise ValueError(f"RandomPE step_size must be > 0, got {step_size}")
        self._rate = float(rate)
        self._min_value = float(min_value)
        self._max_value = float(max_value)
        self._mode = mode
        self._seed = seed
        self._trigger = trigger
        self._step_size = float(step_size)

    # ---- properties ------------------------------------------------------

    @property
    def rate(self) -> float:
        return self._rate

    @property
    def min_value(self) -> float:
        return self._min_value

    @property
    def max_value(self) -> float:
        return self._max_value

    @property
    def mode(self) -> RandomMode:
        return self._mode

    @property
    def seed(self) -> int | None:
        return self._seed

    @property
    def trigger(self) -> ProcessingElement | None:
        return self._trigger

    @property
    def step_size(self) -> float:
        return self._step_size

    # ---- graph contract --------------------------------------------------

    def inputs(self) -> list[ProcessingElement]:
        return [self._trigger] if self._trigger is not None else []

    def is_pure(self) -> bool:
        # Clocked hold/interp modes are pure functions of absolute time;
        # WALK and triggered modes carry state.
        return self._trigger is None and self._mode != RandomMode.WALK

    def state_decays(self) -> bool:
        return self.is_pure()

    def channel_count(self) -> int:
        return 1

    def _compute_extent(self) -> Extent:
        return Extent(None, None)

    # ---- value streams ---------------------------------------------------

    def _value(self, k):
        """Hash segment/trigger ordinal -> uniform in [min, max]."""
        u = white_uniform(k, seed=self._seed or 0, lane=_LANE)  # [-1, 1)
        span = self._max_value - self._min_value
        return (u + 1.0) * 0.5 * span + self._min_value

    def _fold(self, v):
        """Reflect v into [min, max] (triangle fold)."""
        lo, hi = self._min_value, self._max_value
        span = hi - lo
        if span == 0.0:
            return jnp.full_like(v, lo)
        return lo + jnp.abs(jnp.mod(v - lo - span, 2.0 * span) - span)

    def _trace(self, ctx):
        if self._trigger is not None:
            out = self._trace_triggered(ctx)
        elif self._mode == RandomMode.WALK:
            out = self._trace_walk_clocked(ctx)
        else:
            out = self._trace_clocked(ctx)
        return out.astype(prec.AUDIO)[:, None]

    def _segments(self, ctx):
        """(k, frac): segment ordinal + position inside it, per sample."""
        t = ctx.times().astype(jnp.float64)
        pos = t * (self._rate / ctx.sample_rate)
        k = jnp.floor(pos)
        return k.astype(jnp.int64), (pos - k).astype(jnp.float32)

    def _trace_clocked(self, ctx):
        k, frac = self._segments(ctx)
        v0 = self._value(k)
        if self._mode == RandomMode.SAMPLE_HOLD:
            return v0
        v1 = self._value(k + 1)
        if self._mode == RandomMode.SMOOTH:
            frac = frac * frac * (3.0 - 2.0 * frac)
        return v0 + (v1 - v0) * frac

    def _trace_walk_clocked(self, ctx):
        k, _ = self._segments(ctx)
        mid = 0.5 * (self._min_value + self._max_value)
        init = (
            jnp.asarray(jnp.iinfo(jnp.int32).min, jnp.int64),  # prev segment
            jnp.asarray(mid, jnp.float32),
        )
        (pk0, v0), _ = ctx.state(self, init=init, reset_on_gap=True)
        span = self._max_value - self._min_value

        # The walk only steps at segment boundaries — rate/sr per sample
        # — so scanning per SAMPLE wastes a ~sr/rate factor of serial
        # depth. Scan per SEGMENT instead (S ≈ T·rate/sr + 2 steps, e.g.
        # 5 for an 8 Hz walk over a 16k block), then expand to samples
        # with an exact MXU one-hot lookup. Falls back to the per-sample
        # scan when rate approaches the sample rate (k may then skip, and
        # the segment set isn't smaller than the block).
        T = int(k.shape[0])
        s_max = int(np.ceil(T * self._rate / ctx.sample_rate)) + 2
        if s_max < T // 4:
            from pygmu2_tpu.ops.table import table_lookup

            k0 = k[0]
            k_last = k[-1]
            segs = k0 + jnp.arange(s_max, dtype=k.dtype)  # (S,)
            seg_steps = (
                white_uniform(segs, seed=self._seed or 0, lane=_LANE)
                * self._step_size
                * span
            )

            def seg_step(carry, x):
                pk, v = carry
                si, stp = x
                live = si <= k_last  # segments past the block: no-op
                nv = jnp.where(live & (si > pk), self._fold(v + stp), v)
                npk = jnp.where(live, jnp.maximum(si, pk), pk)
                return (npk, nv), nv

            (pk, v), seg_vals = jax.lax.scan(
                seg_step, (pk0, v0), (segs, seg_steps)
            )
            ctx.set_state(self, (pk, v))
            return table_lookup(seg_vals, (k - k0).astype(jnp.int32))

        steps = (
            white_uniform(k, seed=self._seed or 0, lane=_LANE)
            * self._step_size
            * span
        )

        def step(carry, x):
            pk, v = carry
            ki, si = x
            nv = jnp.where(ki > pk, self._fold(v + si), v)
            return (jnp.maximum(ki, pk), nv), nv

        (pk, v), out = jax.lax.scan(step, (pk0, v0), (k, steps))
        ctx.set_state(self, (pk, v))
        return out

    def _trace_triggered(self, ctx):
        trig = ctx.pull(self._trigger)[:, 0] > 0
        mid = 0.5 * (self._min_value + self._max_value)
        init = (
            jnp.zeros((), jnp.int32),            # cumulative trigger count
            jnp.asarray(mid, jnp.float32),       # walk value (unused: hold)
        )
        (c0, v0), _ = ctx.state(self, init=init, reset_on_gap=True)
        count = c0 + jnp.cumsum(trig.astype(jnp.int32))
        if self._mode != RandomMode.WALK:
            # hold the value drawn at the latest trigger (count ordinal)
            out = self._value(count)
            ctx.set_state(self, (count[-1], out[-1].astype(jnp.float32)))
            return out
        # WALK: one reflected step per trigger. Steps are keyed by the
        # trigger ordinal so the stream is chunk-invariant — but the
        # reflection is nonlinear, so scan it.
        span = self._max_value - self._min_value
        steps = (
            white_uniform(count, seed=self._seed or 0, lane=_LANE + 1)
            * self._step_size
            * span
        )

        def step(v, x):
            fired, si = x
            nv = jnp.where(fired, self._fold(v + si), v)
            return nv, nv

        v_last, out = jax.lax.scan(step, v0, (trig, steps))
        ctx.set_state(self, (count[-1], v_last))
        return out

    def __repr__(self) -> str:
        extra = (
            f", trigger={type(self._trigger).__name__}"
            if self._trigger is not None
            else ""
        )
        return (
            f"RandomPE(rate={self._rate}, "
            f"range=[{self._min_value}, {self._max_value}], "
            f"mode={self._mode.value}{extra})"
        )
