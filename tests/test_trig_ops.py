"""ops/trig.py — folded narrow-transcendental sin vs f64 ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from pygmu2_tpu.ops.trig import dirichlet_blit, sinpi_folded


class TestSinpiFolded:
    def test_matches_f64_over_range(self):
        x = jnp.asarray(np.linspace(-7.3, 9.8, 20001), jnp.float64)
        got = np.asarray(sinpi_folded(x))
        want = np.sin(np.pi * np.asarray(x))
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, atol=3e-7)

    def test_relative_accuracy_near_integers(self):
        # The whole point: a value 1e-9 off an integer must come out with
        # RELATIVE precision, where a pre-cast phase would return garbage.
        for k in (0.0, 1.0, 2.0, -3.0, 173.0):
            for d in (1e-9, 1e-7, 1e-5):
                x = jnp.asarray(k + d, jnp.float64)
                got = float(sinpi_folded(x))
                want = float(np.sin(np.pi * (k + d)))
                assert got == pytest.approx(want, rel=1e-5)

    def test_exact_integers_are_zero(self):
        x = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 5.0], jnp.float64)
        np.testing.assert_array_equal(np.asarray(sinpi_folded(x)), 0.0)


class TestDirichletBlit:
    def _naive_f64(self, phase, m, P):
        theta = np.pi * phase
        den = np.sin(theta)
        near = np.abs(den) < 1e-300
        safe = np.where(near, 1.0, den)
        d = np.where(near, m, np.sin(m * theta) / safe)
        return (d - 1.0) / P

    def test_matches_f64_naive(self):
        rng = np.random.default_rng(7)
        phase = jnp.asarray(rng.random(8192), jnp.float64)
        m = jnp.full_like(phase, 99.0)
        P = jnp.full_like(phase, 200.4545)
        got = np.asarray(dirichlet_blit(phase, m, P))
        want = self._naive_f64(np.asarray(phase), 99.0, 200.4545)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_near_wrap_no_blowup(self):
        # Phases within 1e-9..1e-4 of the wrap: the kernel peaks at m/P
        # there; a naive f32 phase cast errs by O(1) this close in.
        eps = jnp.asarray([1e-9, 1e-8, 1e-7, 1e-6, 1e-5, 1e-4], jnp.float64)
        for side in (eps, 1.0 - eps):
            m = jnp.full_like(side, 201.0)
            P = jnp.full_like(side, 400.9)
            got = np.asarray(dirichlet_blit(side, m, P))
            want = self._naive_f64(np.asarray(side), 201.0, 400.9)
            np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_exact_wrap_is_kernel_limit(self):
        z = jnp.asarray([0.0, 1.0], jnp.float64)
        m = jnp.full_like(z, 99.0)
        P = jnp.full_like(z, 200.0)
        got = np.asarray(dirichlet_blit(z, m, P))
        np.testing.assert_allclose(got, (99.0 - 1.0) / 200.0, rtol=1e-6)

    def test_high_harmonic_low_freq(self):
        # 55 Hz at 44.1 kHz → m=401: the regime where the old f32-cast
        # path drifted ~1e-3 through the kernel slope.
        rng = np.random.default_rng(3)
        phase = jnp.asarray(rng.random(4096), jnp.float64)
        m = jnp.full_like(phase, 401.0)
        P = jnp.full_like(phase, 801.8)
        got = np.asarray(dirichlet_blit(phase, m, P))
        want = self._naive_f64(np.asarray(phase), 401.0, 801.8)
        np.testing.assert_allclose(got, want, atol=2e-6)
