"""Oscillators.

TPU-native rebuilds of the reference oscillator family. This module starts
with SinePE (reference: src/pygmu2/sine_pe.py:17); band-limited oscillators
(BlitSawPE, AnalogOscPE, FunctionGenPE, SuperSawPE) live in
``pygmu2_tpu.models.osc_bandlimited``.

Phase math runs in float64 (software-emulated on TPU, cheap relative to the
audio path) so long timelines hold the ≤1e-4 parity budget; audio output is
float32.
"""

from __future__ import annotations

import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement

TWO_PI = 6.283185307179586476925287


class SinePE(ProcessingElement):
    """Sine oscillator; frequency/amplitude/phase each scalar-or-PE.

    Pure (all params constant): phase computed analytically from the
    absolute sample index — stateless, fully parallel.
    Modulated (any param a PE): instantaneous frequency is integrated with
    a cumulative sum and the end-of-block phase is carried as state.
    """

    def __init__(
        self,
        frequency=440.0,
        amplitude=1.0,
        phase=0.0,
        channels: int = 1,
    ):
        self._frequency = frequency
        self._amplitude = amplitude
        self._phase = phase
        self._channels = channels

    @property
    def frequency(self):
        return self._frequency

    @property
    def amplitude(self):
        return self._amplitude

    @property
    def initial_phase(self):
        return self._phase

    def _modulated(self) -> bool:
        return any(
            isinstance(p, ProcessingElement)
            for p in (self._frequency, self._amplitude, self._phase)
        )

    def inputs(self) -> list[ProcessingElement]:
        return [
            p
            for p in (self._frequency, self._amplitude, self._phase)
            if isinstance(p, ProcessingElement)
        ]

    def is_pure(self) -> bool:
        return not self._modulated()

    def channel_count(self) -> int:
        return self._channels

    def _compute_extent(self) -> Extent:
        ext = Extent(None, None)
        for inp in self.inputs():
            ext = ext.intersection(inp.extent())
        return ext

    def _trace(self, ctx):
        sr = ctx.sample_rate
        amp = ctx.param(self._amplitude, dtype=prec.WIDE)[:, None]

        if not self._modulated():
            t = ctx.times(prec.WIDE)
            phase = float(self._phase) + TWO_PI * float(self._frequency) * t / sr
        else:
            freq = ctx.param(self._frequency, dtype=prec.WIDE)
            inc = TWO_PI * freq / sr
            # Initial phase: constant phase offset on the very first block,
            # otherwise the carried end-of-block phase (reference:
            # sine_pe.py:199-232 — the carried value includes phase mod).
            init_phase = (
                float(self._phase)
                if not isinstance(self._phase, ProcessingElement)
                else 0.0
            )
            acc, _ = ctx.state(
                self, init=jnp.asarray(init_phase, dtype=prec.WIDE)
            )
            phase = acc + jnp.cumsum(inc)
            if isinstance(self._phase, ProcessingElement):
                phase = phase + ctx.param(self._phase, dtype=prec.WIDE)
            ctx.set_state(self, phase[-1])

        samples = (amp * jnp.sin(phase[:, None])).astype(prec.AUDIO)
        if self._channels > 1:
            samples = jnp.tile(samples, (1, self._channels))
        return samples

    def __repr__(self) -> str:
        def s(p):
            return type(p).__name__ if isinstance(p, ProcessingElement) else str(p)

        return (
            f"SinePE(frequency={s(self._frequency)}, amplitude={s(self._amplitude)}, "
            f"phase={s(self._phase)}, channels={self._channels})"
        )
