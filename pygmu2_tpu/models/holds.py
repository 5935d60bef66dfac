"""Latch / slew / live-control PEs, and CachePE.

TPU-native rebuilds of:
- SampleHoldPE (reference: src/pygmu2/sample_hold_pe.py:21) — latch the
  source on positive trigger events.
- TrackHoldPE  (reference: src/pygmu2/track_hold_pe.py:21) — follow the
  source while gate=1, hold while 0.
- SlewLimiterPE (reference: src/pygmu2/slew_limiter_pe.py:36) — rate
  limiter, LINEAR (clamped step) or EXPONENTIAL (asymmetric one-pole).
- ControlPE    (reference: src/pygmu2/control_pe.py:28) — value settable
  from any thread between blocks.
- CachePE      (reference: src/pygmu2/cache_pe.py:21) — in the compiled
  world a pure no-op marker: the engine's trace memo (plus XLA CSE) gives
  the sharing the reference needed a cache for.

TPU design: both hold PEs are *parallel* despite looking stateful — the
"last latched value" at index i is a cumulative max over event positions,
so they compile to cummax + gather instead of a scan. The slew limiter's
clamped/asymmetric updates are data-dependent and provably serial
(ops/slew_pallas.py): a register-resident Mosaic kernel on TPU, an
unrolled lax.scan elsewhere.
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement, SourcePE
from pygmu2_tpu.models.modes import SlewMode


def _latch(src, cond, carried):
    """out[i] = src[j] for the latest j ≤ i with cond[j]; carried before.

    Parallel form: cummax over event indices, then gather.
    """
    T = src.shape[0]
    idx = jnp.arange(T, dtype=jnp.int32)
    event_idx = jnp.where(cond, idx, -1)
    last = jax.lax.cummax(event_idx)
    picked = src[jnp.clip(last, 0, T - 1)]
    out = jnp.where(last >= 0, picked, carried)
    return out


class SampleHoldPE(ProcessingElement):
    """Latch channel 0 of the source on each positive trigger sample."""

    def __init__(self, source, trigger, initial_value: float = 0.0):
        self._source = source
        self._trigger = trigger
        self._initial_value = float(initial_value)

    @property
    def initial_value(self) -> float:
        return self._initial_value

    def inputs(self) -> list[ProcessingElement]:
        return [self._source, self._trigger]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return 1

    def _compute_extent(self) -> Extent:
        return Extent(None, None)

    def _trace(self, ctx):
        trig = ctx.pull(self._trigger)[:, 0]
        src = ctx.pull(self._source)[:, 0]
        held, _ = ctx.state(
            self, init=jnp.asarray(self._initial_value, prec.AUDIO)
        )
        out = _latch(src, trig > 0, held)
        ctx.set_state(self, out[-1])
        return out[:, None]

    def __repr__(self) -> str:
        return (
            f"SampleHoldPE(source={type(self._source).__name__}, "
            f"trigger={type(self._trigger).__name__}, "
            f"initial_value={self._initial_value})"
        )


class TrackHoldPE(ProcessingElement):
    """Follow the source while gate > 0.5; hold the last value while low."""

    def __init__(self, source, gate, initial_value: float = 0.0):
        self._source = source
        self._gate = gate
        self._initial_value = float(initial_value)

    @property
    def initial_value(self) -> float:
        return self._initial_value

    def inputs(self) -> list[ProcessingElement]:
        return [self._source, self._gate]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return 1

    def _compute_extent(self) -> Extent:
        return Extent(None, None)

    def _trace(self, ctx):
        gate = ctx.pull(self._gate)[:, 0]
        src = ctx.pull(self._source)[:, 0]
        held, _ = ctx.state(
            self, init=jnp.asarray(self._initial_value, prec.AUDIO)
        )
        out = _latch(src, gate > 0.5, held)
        ctx.set_state(self, out[-1])
        return out[:, None]

    def __repr__(self) -> str:
        return (
            f"TrackHoldPE(source={type(self._source).__name__}, "
            f"gate={type(self._gate).__name__}, "
            f"initial_value={self._initial_value})"
        )


class SlewLimiterPE(ProcessingElement):
    """Rate-limit a mono control signal (units/second)."""

    def state_decays(self) -> bool:
        return True  # slewed value catches the input after a finite warm-up

    def __init__(
        self,
        source: ProcessingElement,
        rise_rate: float,
        fall_rate: float | None = None,
        mode: SlewMode = SlewMode.LINEAR,
    ):
        if rise_rate <= 0:
            raise ValueError("rise_rate must be > 0")
        self._source = source
        self._rise_rate = float(rise_rate)
        self._fall_rate = float(fall_rate) if fall_rate is not None else self._rise_rate
        if self._fall_rate <= 0:
            raise ValueError("fall_rate must be > 0")
        self._mode = mode

    @property
    def rise_rate(self) -> float:
        return self._rise_rate

    @property
    def fall_rate(self) -> float:
        return self._fall_rate

    @property
    def mode(self) -> SlewMode:
        return self._mode

    def inputs(self) -> list[ProcessingElement]:
        return [self._source]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return 1

    def _compute_extent(self) -> Extent:
        return Extent(None, None)

    def _trace(self, ctx):
        from pygmu2_tpu.ops import diffable as _dfb
        from pygmu2_tpu.ops.slew_pallas import slew_scan_pallas, slew_scan_ref

        src = ctx.pull(self._source)[:, 0]
        sr = float(ctx.sample_rate)
        rise_dt = self._rise_rate / sr
        fall_dt = self._fall_rate / sr
        current0, _ = ctx.state(self, init=jnp.zeros((), prec.AUDIO))

        linear = self._mode == SlewMode.LINEAR
        if linear:
            p_rise, p_fall = rise_dt, fall_dt
        else:
            p_rise, p_fall = min(rise_dt, 1.0), min(fall_dt, 1.0)

        # Genuinely serial recurrence (slope-{1,0,1} maps staircase under
        # composition — see ops/slew_pallas.py); the Mosaic kernel keeps
        # the value in vector registers with an 8-sample unroll.
        if _dfb.kernel_path_enabled():
            out, final = slew_scan_pallas(
                src.astype(jnp.float32), current0,
                linear=linear, p_rise=float(p_rise), p_fall=float(p_fall),
                interpret=_dfb.kernel_interpret(),
            )
        else:
            out, final = slew_scan_ref(
                src, current0,
                linear=linear, p_rise=float(p_rise), p_fall=float(p_fall),
            )
        ctx.set_state(self, final)
        return out.astype(prec.AUDIO)[:, None]

    def __repr__(self) -> str:
        return (
            f"SlewLimiterPE(rise_rate={self._rise_rate}, "
            f"fall_rate={self._fall_rate}, mode={self._mode.value})"
        )


class ControlPE(SourcePE):
    """Constant-valued source whose value is settable from any thread.

    The live value rides in the carried state pytree: ``set_value`` writes
    it host-side between blocks (thread-safe), so the compiled program
    never retraces when the value changes.
    """

    def __init__(self, initial_value: float = 0.0, channels: int = 1):
        self._initial = float(initial_value)
        self._pending = float(initial_value)
        self._lock = threading.Lock()
        self._channels = channels

    def set_value(self, value: float) -> None:
        """Thread-safe: takes effect on the next rendered block."""
        import numpy as np

        with self._lock:
            self._pending = float(value)
            # version bump: tells Program.run an external write landed,
            # so an in-flight block's scatter must not clobber it
            self._eng_version = getattr(self, "_eng_version", 0) + 1
            if self._eng_state is not None:
                self._eng_state = {
                    "user": jnp.asarray(np.float32(value)),
                    "next": self._eng_state["next"],
                }

    @property
    def value(self) -> float:
        return self._pending

    def _eng_live_state(self):
        """Live payload for the engine's external-write-wins scatter
        guard (engine.Program.run)."""
        import numpy as np

        with self._lock:
            return jnp.asarray(np.float32(self._pending))

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return self._channels

    def _compute_extent(self) -> Extent:
        return Extent(None, None)

    def _trace(self, ctx):
        with self._lock:
            init = self._pending
        val, _ = ctx.state(
            self, init=jnp.asarray(init, jnp.float32), reset_on_gap=False
        )
        ctx.set_state(self, val)
        return jnp.full((ctx.duration, self._channels), val, dtype=prec.AUDIO)

    def __repr__(self) -> str:
        return f"ControlPE(value={self._pending}, channels={self._channels})"


class CachePE(ProcessingElement):
    """Marker legalizing fan-out of an impure source inside composites.

    The engine's per-block trace memo already renders any node once per
    (start, duration); CachePE passes through and reports pure so the
    validator accepts multiple sinks (reference: cache_pe.py:47-50).
    """

    def __init__(self, source: ProcessingElement):
        self._source = source

    @property
    def source(self) -> ProcessingElement:
        return self._source

    def inputs(self) -> list[ProcessingElement]:
        return [self._source]

    def is_pure(self) -> bool:
        return True

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        return self._source.extent()

    def _trace(self, ctx):
        return ctx.pull(self._source)

    def __repr__(self) -> str:
        return f"CachePE(source={type(self._source).__name__})"
