"""Index-lookup and windowed-statistics PEs.

TPU-native rebuilds of:
- WavetablePE (reference: src/pygmu2/wavetable_pe.py:32-178) —
  ``out[t] = table[indexer[t]]`` with LINEAR/CUBIC interpolation and
  ZERO/CLAMP/WRAP out-of-bounds modes.
- TimeWarpPE  (reference: src/pygmu2/timewarp_pe.py:38-196) — variable
  speed tape head: ``indices = pos + prefix_sum(rate)`` with carried
  ``pos``; supports negative rates.
- WindowPE    (reference: src/pygmu2/window_pe.py:26-258) — zero-phase
  centered window stats MAX/MIN/MEAN/RMS, fetching a halo around the
  block (possible because time is random-access).

TPU design notes: XLA needs static shapes, so WavetablePE pulls the
whole (finite) table once per block and gathers; TimeWarpPE pulls a
window sized by a static ``max_rate`` bound at a *traced* start (the
prefix sum of rates is parallel); WindowPE's sliding max/min compile to
``lax.reduce_window`` and mean/RMS to cumulative sums.
"""

from __future__ import annotations

import math
import threading

import jax
import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement
from pygmu2_tpu.models.modes import InterpolationMode, OutOfBoundsMode, WindowMode
from pygmu2_tpu.ops.interp import interp_window


class WavetablePE(ProcessingElement):
    """``out[t] = wavetable[indexer[t]]`` with interpolation."""

    def __init__(
        self,
        wavetable: ProcessingElement,
        indexer: ProcessingElement,
        interpolation: InterpolationMode = InterpolationMode.LINEAR,
        out_of_bounds: OutOfBoundsMode = OutOfBoundsMode.ZERO,
    ):
        self._wavetable = wavetable
        self._indexer = indexer
        self._interpolation = interpolation
        self._out_of_bounds = out_of_bounds

    @property
    def wavetable(self) -> ProcessingElement:
        return self._wavetable

    @property
    def indexer(self) -> ProcessingElement:
        return self._indexer

    @property
    def interpolation(self) -> InterpolationMode:
        return self._interpolation

    @property
    def out_of_bounds(self) -> OutOfBoundsMode:
        return self._out_of_bounds

    def inputs(self) -> list[ProcessingElement]:
        return [self._wavetable, self._indexer]

    def is_pure(self) -> bool:
        return True

    def channel_count(self) -> int | None:
        return self._wavetable.channel_count()

    def _compute_extent(self) -> Extent:
        return self._indexer.extent()

    def _trace(self, ctx):
        idx = ctx.pull(self._indexer)[:, 0].astype(jnp.float32)
        wt_ext = self._wavetable.extent()
        if wt_ext.start is None or wt_ext.end is None:
            raise ValueError(
                "WavetablePE requires a wavetable with finite extent "
                "(XLA shapes are static); wrap the source in CropPE."
            )
        w_start, w_end = wt_ext.start, wt_ext.end
        table = ctx.pull_abs(self._wavetable, w_start, w_end - w_start)

        mode = (
            "cubic" if self._interpolation == InterpolationMode.CUBIC else "linear"
        )
        pos = idx - w_start
        W = w_end - w_start
        if self._out_of_bounds == OutOfBoundsMode.WRAP:
            pos = jnp.mod(pos, W)
            return interp_window(table, pos, mode=mode, oob_zero=False)
        if self._out_of_bounds == OutOfBoundsMode.CLAMP:
            pos = jnp.clip(pos, 0.0, W - 1)
            return interp_window(table, pos, mode=mode, oob_zero=False)
        out = interp_window(table, pos, mode=mode, oob_zero=False)
        valid = (pos >= 0.0) & (pos < W)
        return jnp.where(valid[:, None], out, 0.0)

    def __repr__(self) -> str:
        return (
            f"WavetablePE(wavetable={type(self._wavetable).__name__}, "
            f"indexer={type(self._indexer).__name__}, "
            f"interpolation={self._interpolation.value})"
        )


class TimeWarpPE(ProcessingElement):
    """Variable-speed playback: rate in source-samples per output-sample.

    ``max_rate`` bounds |rate| for PE-valued rates (static window sizing
    on TPU); scalar rates size the window exactly.
    """

    def __init__(
        self,
        source: ProcessingElement,
        rate=1.0,
        interpolation: InterpolationMode = InterpolationMode.LINEAR,
        max_rate: float = 4.0,
    ):
        self._source = source
        self._rate = rate
        self._rate_is_pe = isinstance(rate, ProcessingElement)
        self._interpolation = interpolation
        self._max_rate = abs(float(rate)) if not self._rate_is_pe else float(max_rate)
        self._pos_lock = threading.Lock()
        self._pending_pos = 0.0

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def rate(self):
        return self._rate

    @property
    def interpolation(self) -> InterpolationMode:
        return self._interpolation

    def seek(self, position: float) -> None:
        """Thread-safe tape-head seek: takes effect on the next block.

        Mirrors :meth:`ControlPE.set_value` — the live position rides in
        the carried state pytree, so scrubbing from a UI thread never
        retraces (the reference's jog/shuttle player pokes its
        ``TimeWarpPE._pos`` the same way; scripts/jogshuttle.py:628-648).
        Seeking before the first render sets the initial tape position.
        """
        with self._pos_lock:
            self._pending_pos = float(position)
            # version bump: an in-flight block's scatter must not clobber
            # this write (engine.Program.run live-control-wins rule)
            self._eng_version = getattr(self, "_eng_version", 0) + 1
            st = getattr(self, "_eng_state", None)
            if st is not None:
                self._eng_state = {
                    "user": jnp.asarray(float(position), prec.WIDE),
                    "next": st["next"],
                }

    @property
    def position(self) -> float:
        """Current tape-head position in source samples (host read)."""
        st = getattr(self, "_eng_state", None)
        if st is not None:
            return float(st["user"])
        return self._pending_pos

    def _eng_live_state(self):
        """Live payload for the engine's external-write-wins scatter
        guard (engine.Program.run)."""
        with self._pos_lock:
            return jnp.asarray(self._pending_pos, prec.WIDE)

    def inputs(self) -> list[ProcessingElement]:
        if self._rate_is_pe:
            return [self._source, self._rate]
        return [self._source]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        # Reference semantics (timewarp_pe.py:88-137): rate-PE extent wins;
        # constant rate over a finite source maps the source bounds through
        # the tape-head trajectory pos = n·r.
        if self._rate_is_pe:
            return self._rate.extent()
        src = self._source.extent()
        if src.start is None or src.end is None:
            return Extent(None, None)
        src_start, src_end = float(src.start), float(src.end)
        r = float(self._rate)
        if r == 0.0:
            if src_start <= 0.0 < src_end:
                return Extent(None, None)
            return Extent(0, 0)
        if r > 0.0:
            n_start = max(0, int(math.ceil(src_start / r)) if src_start > 0 else 0)
            n_end = max(n_start, int(math.ceil(src_end / r)))
            return Extent(n_start, n_end)
        lower = src_end / r
        upper = src_start / r
        n_start = max(0, int(math.floor(lower)) + 1)
        n_end = max(n_start, int(math.floor(upper)) + 1)
        return Extent(n_start, n_end)

    def _trace(self, ctx):
        T = ctx.duration
        rate = ctx.param(self._rate, dtype=prec.WIDE)
        with self._pos_lock:
            init_pos = self._pending_pos  # trace-time constant (like ControlPE)
        pos0, _ = ctx.state(self, init=jnp.asarray(init_pos, prec.WIDE))
        if self._rate_is_pe:
            prefix = jnp.concatenate(
                [jnp.zeros((1,), prec.WIDE), jnp.cumsum(rate[:-1])]
            )
            total = jnp.sum(rate)
        else:
            # Constant rate (the common case): i*r is exact in f64 and
            # skips the software-emulated f64 cumsum entirely.
            prefix = jnp.arange(T, dtype=prec.WIDE) * rate[0]
            total = jnp.asarray(T, prec.WIDE) * rate[0]
        indices = pos0 + prefix
        ctx.set_state(self, pos0 + total)

        mode = (
            "cubic" if self._interpolation == InterpolationMode.CUBIC else "linear"
        )
        pad = 2 if mode == "cubic" else 1
        win_len = int(math.ceil(T * self._max_rate)) + 2 * pad + 2

        win_start = jnp.floor(jnp.min(indices)).astype(prec.INDEX) - pad
        window = ctx.pull_abs(self._source, win_start, win_len)
        pos = (indices - win_start.astype(prec.WIDE)).astype(jnp.float32)
        out = interp_window(window, pos, mode=mode, oob_zero=True)

        # Zero-mask indices outside the source extent (reference rule).
        src_ext = self._source.extent()
        valid = jnp.ones((T,), bool)
        if src_ext.start is not None:
            valid &= indices >= src_ext.start
        if src_ext.end is not None:
            valid &= indices < src_ext.end
        return jnp.where(valid[:, None], out, 0.0)

    def __repr__(self) -> str:
        r = type(self._rate).__name__ if self._rate_is_pe else self._rate
        return f"TimeWarpPE(source={type(self._source).__name__}, rate={r})"


def _blocked_prefix(x, block: int = 1024):
    """Inclusive prefix sum with a leading zero row, f32 throughout.

    A flat f64 ``cumsum`` (what this replaces) is software-emulated on
    TPU — ~log T tree passes of double-f32 arithmetic. Two-level
    blocking keeps everything native f32 while bounding the scan's
    error accumulation to one block: local f32 cumsums within
    ``block``-row tiles plus an f32 cumsum over the ≤T/block block
    totals. The reconstruction rounds once at full magnitude per
    element, so a windowed difference ``csum[t+w] − csum[t]`` carries
    ~eps·Σ|x| absolute error — orders below the ≤1e-4 parity budget for
    block-bounded trace windows.
    """
    T, C = x.shape
    x = x.astype(jnp.float32)
    Tp = -(-T // block) * block
    xb = jnp.pad(x, ((0, Tp - T), (0, 0))).reshape(Tp // block, block, C)
    loc = jnp.cumsum(xb, axis=1)
    base = jnp.cumsum(loc[:, -1, :], axis=0)
    base = jnp.concatenate([jnp.zeros_like(base[:1]), base[:-1]], axis=0)
    csum = (loc + base[:, None, :]).reshape(Tp, C)[:T]
    return jnp.concatenate([jnp.zeros_like(csum[:1]), csum], axis=0)


class WindowPE(ProcessingElement):
    """Zero-phase centered window statistic (MAX/MIN/MEAN/RMS)."""

    def __init__(
        self,
        source: ProcessingElement,
        window: float = 0.05,
        mode: WindowMode = WindowMode.MAX,
        rectify: bool = True,
    ):
        self._source = source
        self._window = max(0.0, window)
        self._mode = mode
        self._rectify = rectify

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def window(self) -> float:
        return self._window

    @property
    def mode(self) -> WindowMode:
        return self._mode

    @property
    def rectify(self) -> bool:
        return self._rectify

    def inputs(self) -> list[ProcessingElement]:
        return [self._source]

    def is_pure(self) -> bool:
        return True

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        return self._source.extent()

    def _trace(self, ctx):
        half = max(1, int(self._window * ctx.sample_rate / 2))
        T = ctx.duration
        x = ctx.pull(self._source, shift=-half, duration=T + 2 * half)
        if self._rectify:
            x = jnp.abs(x)
        wsize = 2 * half + 1

        if self._mode == WindowMode.MAX:
            out = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (wsize, 1), (1, 1), "valid"
            )
        elif self._mode == WindowMode.MIN:
            out = jax.lax.reduce_window(
                x, jnp.inf, jax.lax.min, (wsize, 1), (1, 1), "valid"
            )
        elif self._mode == WindowMode.MEAN:
            csum = _blocked_prefix(x)
            out = (csum[wsize:] - csum[:-wsize]) / wsize
        else:  # RMS
            csq = _blocked_prefix(x * x)
            out = jnp.sqrt(
                jnp.maximum((csq[wsize:] - csq[:-wsize]) / wsize, 0.0)
            )
        return out.astype(prec.AUDIO)

    def __repr__(self) -> str:
        return (
            f"WindowPE(source={type(self._source).__name__}, "
            f"window={self._window}, mode={self._mode.value})"
        )
