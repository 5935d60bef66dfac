"""NoisePE tests: determinism, block invariance, spectral sanity."""

import numpy as np

from pygmu2_tpu import NoiseMode, NoisePE


class TestWhite:
    def test_deterministic_by_seed(self):
        a = NoisePE(seed=42).render(0, 1000).data
        b = NoisePE(seed=42).render(0, 1000).data
        c = NoisePE(seed=43).render(0, 1000).data
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_block_invariance(self):
        # Counter-based noise: chunked == one-shot.
        pe = NoisePE(seed=7)
        one = pe.render(0, 1000).data
        pe2 = NoisePE(seed=7)
        parts = [pe2.render(i * 250, 250).data for i in range(4)]
        np.testing.assert_array_equal(np.concatenate(parts), one)

    def test_range_default(self):
        d = NoisePE(seed=1).render(0, 10000).data
        assert d.min() >= -1.0 and d.max() < 1.0
        assert abs(d.mean()) < 0.05  # roughly zero-mean uniform

    def test_custom_range(self):
        d = NoisePE(min_value=0.0, max_value=2.0, seed=1).render(0, 5000).data
        assert d.min() >= 0.0 and d.max() <= 2.0
        assert abs(d.mean() - 1.0) < 0.05


class TestColors:
    def _spectrum_slope(self, x, sr=44100):
        """dB/octave slope of the power spectrum between 100 Hz and 10 kHz."""
        spec = np.abs(np.fft.rfft(x)) ** 2
        freqs = np.fft.rfftfreq(len(x), 1 / sr)
        mask = (freqs > 100) & (freqs < 10000)
        logf = np.log2(freqs[mask])
        logp = 10 * np.log10(spec[mask] + 1e-30)
        return np.polyfit(logf, logp, 1)[0]

    def test_pink_slope(self):
        x = NoisePE(seed=3, mode=NoiseMode.PINK).render(0, 1 << 16).data[:, 0]
        slope = self._spectrum_slope(x)
        assert -5.0 < slope < -1.5  # ≈ −3 dB/octave

    def test_brown_slope(self):
        x = NoisePE(seed=3, mode=NoiseMode.BROWN).render(0, 1 << 16).data[:, 0]
        slope = self._spectrum_slope(x)
        assert slope < -4.5  # ≈ −6 dB/octave

    def test_brown_bounded(self):
        x = NoisePE(seed=3, mode=NoiseMode.BROWN).render(0, 1 << 15).data
        assert np.abs(x).max() <= 1.0

    def test_brown_matches_sequential_loop(self):
        # The composed-clamp associative scan must be bit-identical to
        # the reference's per-sample clipped walk (noise_pe.py:150-171).
        x = np.asarray(
            NoisePE(seed=11, mode=NoiseMode.BROWN).render(0, 4096).data
        )[:, 0]
        from pygmu2_tpu.ops.noise import white_uniform_np

        w = white_uniform_np(np.arange(4096), seed=11)
        y, seq = 0.0, []
        for wi in w:
            y = min(max(np.float32(y + np.float32(wi * np.float32(0.02))), -1.0), 1.0)
            seq.append(y)
        np.testing.assert_allclose(x, np.asarray(seq, np.float32), atol=2e-6)

    def test_brown_chunked_matches_oneshot(self):
        pe = NoisePE(seed=4, mode=NoiseMode.BROWN)
        one = NoisePE(seed=4, mode=NoiseMode.BROWN).render(0, 900).data
        parts = [pe.render(i * 300, 300).data for i in range(3)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-6)

    def test_clamp_accum_scan_saturation_heavy(self):
        # Exactness under hard saturation (big steps pinning both rails).
        import jax.numpy as jnp

        from pygmu2_tpu.ops.linrec import clamp_accum_scan

        rng = np.random.default_rng(0)
        for _ in range(5):
            d = rng.normal(0, 1.5, 777).astype(np.float32)
            s0 = np.float32(rng.uniform(-1, 1))
            y = np.asarray(clamp_accum_scan(jnp.asarray(d), -1.0, 1.0, jnp.asarray(s0)))
            ref, cur = [], s0
            for di in d:
                cur = np.float32(min(max(cur + di, -1.0), 1.0))
                ref.append(cur)
            np.testing.assert_allclose(y, np.asarray(ref, np.float32), atol=2e-6)

    def test_pink_state_carry_is_contiguous(self):
        pe = NoisePE(seed=9, mode=NoiseMode.PINK)
        one = NoisePE(seed=9, mode=NoiseMode.PINK).render(0, 800).data
        parts = [pe.render(i * 200, 200).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)
