"""TralfamPE — spectral scramble.

TPU-native rebuild of the reference TralfamPE (reference:
src/pygmu2/tralfam_pe.py:25-148): FFT the whole finite source, keep the
magnitudes, randomize the phases, IFFT; serve slices of the result.

The reference renders+caches host-side; here the mogrification happens
inside the compiled program (whole-extent pull → batched FFT → phase
hash → IFFT → gather), so it fuses with the rest of the graph, and the
random phases come from the counter-based hash (reproducible by seed,
block-invariant).
"""

from __future__ import annotations

import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement
from pygmu2_tpu.ops.noise import white_uniform


class TralfamPE(ProcessingElement):
    """Keep the source's spectrum, scramble its phase."""

    def __init__(
        self,
        source: ProcessingElement,
        seed: int | None = None,
        normalize_peak: float | None = None,
    ):
        import math

        self._source = source
        self._seed = seed
        if normalize_peak is not None and (
            normalize_peak <= 0 or not math.isfinite(normalize_peak)
        ):
            raise ValueError(
                f"normalize_peak must be a positive finite number, got {normalize_peak!r}"
            )
        self._normalize_peak = normalize_peak

    def inputs(self) -> list[ProcessingElement]:
        return [self._source]

    def is_pure(self) -> bool:
        return True

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        return self._source.extent()

    def _trace(self, ctx):
        ext = self._source.extent()
        if ext.start is None or ext.end is None:
            raise ValueError(
                f"{type(self).__name__} requires finite source extent; got {ext}"
            )
        n = ext.end - ext.start
        if n <= 0:
            raise ValueError(
                f"{type(self).__name__} requires positive extent duration"
            )
        frames = ctx.pull_abs(self._source, ext.start, n)  # (n, C)
        C = frames.shape[1]

        analysis = jnp.fft.fft(frames, axis=0)
        magnitudes = jnp.abs(analysis)
        # Random phase per (bin, channel), uniform [0, 2π).
        idx = jnp.arange(n, dtype=prec.INDEX)[:, None] * C + jnp.arange(
            C, dtype=prec.INDEX
        )
        phases = (white_uniform(idx, seed=self._seed or 0) + 1.0) * jnp.pi
        mangled = magnitudes * jnp.exp(1j * phases)
        mogrified = jnp.real(jnp.fft.ifft(mangled, axis=0)).astype(prec.AUDIO)
        if self._normalize_peak is not None:
            peak = jnp.max(jnp.abs(mogrified))
            mogrified = jnp.where(
                peak > 0, mogrified * (self._normalize_peak / peak), mogrified
            )

        t = ctx.times()
        pos = jnp.clip(t - ext.start, 0, n - 1).astype(jnp.int32)
        # Engine masks outside the extent.
        return mogrified[pos]

    def __repr__(self) -> str:
        return f"TralfamPE(source={type(self._source).__name__}, seed={self._seed})"
