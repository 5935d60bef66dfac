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

    def _prepare_host(self):
        """Engine host-prelude hook: build the scramble before tracing."""
        ext = self._source.extent()
        if ext.start is not None and ext.end is not None and ext.end > ext.start:
            self._mogrified_host()

    def _mogrified_host(self):
        """One-time host-side scramble, cached on the instance.

        The full-length FFT runs ONCE in numpy: XLA's TPU FFT lowers
        non-power-of-two lengths to a dense (n, n) DFT matmul (31 GB for
        n = 88200), and re-running it per rendered block is wasted work
        either way — the scramble is a fixed function of the source.
        """
        if getattr(self, "_mog_cache", None) is None:
            import numpy as np

            from pygmu2_tpu.ops.noise import white_uniform_np

            ext = self._source.extent()
            n = ext.end - ext.start
            x = np.asarray(self._source.render(ext.start, n).data)
            C = x.shape[1]
            analysis = np.fft.fft(x, axis=0)
            magnitudes = np.abs(analysis)
            idx = np.arange(n, dtype=np.int64)[:, None] * C + np.arange(C)
            phases = (white_uniform_np(idx, seed=self._seed or 0) + 1.0) * np.pi
            mangled = magnitudes * np.exp(1j * phases)
            mog = np.real(np.fft.ifft(mangled, axis=0)).astype(np.float32)
            if self._normalize_peak is not None:
                peak = np.abs(mog).max()
                if peak > 0:
                    mog = mog * (self._normalize_peak / peak)
            self._mog_cache = jnp.asarray(mog)
        return self._mog_cache

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
        mogrified = self._mogrified_host()
        t = ctx.times()
        pos = jnp.clip(t - ext.start, 0, n - 1).astype(jnp.int32)
        # Engine masks outside the extent.
        return mogrified[pos]

    def __repr__(self) -> str:
        return f"TralfamPE(source={type(self._source).__name__}, seed={self._seed})"
