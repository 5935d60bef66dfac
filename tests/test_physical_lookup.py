"""Ladder/Comb/KarplusStrong + Wavetable/TimeWarp/Window tests, including
golden parity vs the reference implementation."""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    ArrayPE,
    CombPE,
    ConstantPE,
    CropPE,
    DiracPE,
    IdentityPE,
    InterpolationMode,
    KarplusStrongPE,
    LadderMode,
    LadderPE,
    OutOfBoundsMode,
    PiecewisePE,
    SinePE,
    TimeWarpPE,
    WavetablePE,
    WindowMode,
    WindowPE,
)
from tests.ref_oracle import load_reference

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)

ref = load_reference()
SR = 44100


class TestWavetable:
    def test_identity_indexer_reproduces_table(self):
        table = ArrayPE(np.linspace(-1, 1, 100, dtype=np.float32))
        out = WavetablePE(table, IdentityPE()).render(0, 100)
        np.testing.assert_allclose(
            out.data[:, 0], np.linspace(-1, 1, 100), atol=1e-6
        )

    def test_fractional_linear(self):
        table = ArrayPE(np.arange(10, dtype=np.float32))
        idx = ArrayPE(np.array([0.5, 2.25, 8.75], dtype=np.float32))
        out = WavetablePE(table, idx).render(0, 3)
        np.testing.assert_allclose(out.data[:, 0], [0.5, 2.25, 8.75], atol=1e-5)

    def test_wrap_mode(self):
        table = ArrayPE(np.arange(4, dtype=np.float32))
        idx = ArrayPE(np.array([5.0, -1.0], dtype=np.float32))
        out = WavetablePE(
            table, idx, out_of_bounds=OutOfBoundsMode.WRAP
        ).render(0, 2)
        np.testing.assert_allclose(out.data[:, 0], [1.0, 3.0], atol=1e-5)

    def test_zero_mode(self):
        table = ArrayPE(np.ones(4, np.float32))
        idx = ArrayPE(np.array([-0.5, 2.0, 4.5], dtype=np.float32))
        out = WavetablePE(table, idx).render(0, 3)
        np.testing.assert_allclose(out.data[:, 0], [0.0, 1.0, 0.0])

    def test_infinite_table_raises(self):
        with pytest.raises(ValueError):
            WavetablePE(ConstantPE(1.0), IdentityPE()).render(0, 4)


class TestTimeWarp:
    def test_double_speed(self):
        src = CropPE(IdentityPE(), 0, 1000)
        tw = TimeWarpPE(src, rate=2.0)
        out = tw.render(0, 100).data[:, 0]
        np.testing.assert_allclose(out, np.arange(100) * 2.0, atol=1e-3)

    def test_extent_constant_rate(self):
        src = CropPE(IdentityPE(), 0, 1000)
        assert TimeWarpPE(src, rate=2.0).extent() == pg.Extent(0, 500)
        assert TimeWarpPE(src, rate=0.5).extent() == pg.Extent(0, 2000)

    def test_state_carry_across_blocks(self):
        src = CropPE(IdentityPE(), 0, 4000)


        def fresh():
            return TimeWarpPE(CropPE(IdentityPE(), 0, 4000), rate=1.5)

        one = fresh().render(0, 1000).data
        pe = fresh()
        parts = [pe.render(i * 250, 250).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-3)

    def test_modulated_rate(self):
        src = CropPE(IdentityPE(), 0, 10000)
        rate = PiecewisePE([(0, 1.0), (1000, 2.0)])
        tw = TimeWarpPE(src, rate=rate, max_rate=2.5)
        out = tw.render(0, 500).data[:, 0]
        # position = prefix sum of ramping rate; strictly increasing
        assert np.all(np.diff(out) > 0)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-4)


class TestWindow:
    def test_max_of_impulse_is_plateau(self):
        out = WindowPE(DiracPE(), window=0.001, mode=WindowMode.MAX).render(-50, 100)
        w_half = max(1, int(0.001 * SR / 2))
        plateau = out.data[:, 0] > 0.5
        assert plateau.sum() == 2 * w_half + 1

    def test_mean_matches_numpy(self):
        sig = np.random.default_rng(0).uniform(-1, 1, 500).astype(np.float32)
        out = WindowPE(
            ArrayPE(sig), window=21 / SR, mode=WindowMode.MEAN, rectify=False
        ).render(100, 100)
        half = 10
        expect = [
            np.mean(sig[i - half : i + half + 1]) for i in range(100, 200)
        ]
        np.testing.assert_allclose(out.data[:, 0], expect, atol=1e-5)

    def test_rms_positive(self):
        out = WindowPE(
            SinePE(frequency=441.0), window=0.01, mode=WindowMode.RMS
        ).render(0, 1000)
        np.testing.assert_allclose(
            out.data[500, 0], 1 / np.sqrt(2), atol=0.02
        )


class TestKarplusStrong:
    def test_deterministic_by_seed(self):
        a = KarplusStrongPE(220.0, seed=5).render(0, 2000).data
        b = KarplusStrongPE(220.0, seed=5).render(0, 2000).data
        np.testing.assert_array_equal(a, b)

    def test_harmonic_series(self):
        # A plucked string shows spectral lines at multiples of f0 (the
        # excitation noise also leaves a DC pedestal — ignore below 100 Hz).
        n = 1 << 15
        y = KarplusStrongPE(441.0, rho=0.999, seed=1).render(0, n).data[:, 0]
        spec = np.abs(np.fft.rfft(y * np.hanning(n)))
        freqs = np.fft.rfftfreq(n, 1 / SR)
        spec[freqs < 100.0] = 0.0
        top_bins = np.argsort(spec)[-10:]
        f0 = 441.0
        for f in freqs[top_bins]:
            harmonic = round(f / f0)
            assert harmonic >= 1 and abs(f - harmonic * f0) < 15.0

    def test_decays(self):
        y = KarplusStrongPE(220.0, rho=0.95, seed=1).render(0, SR).data[:, 0]
        early = np.abs(y[:2000]).max()
        late = np.abs(y[-2000:]).max()
        assert late < early * 0.01

    def test_two_phase_decay(self):
        y = KarplusStrongPE(
            220.0, rho=0.999, duration=4000, rho_damping=0.8, seed=1
        ).render(0, 8000).data[:, 0]
        assert np.abs(y[6000:]).max() < np.abs(y[3000:4000]).max() * 0.1

    def test_zero_before_origin(self):
        y = KarplusStrongPE(220.0, seed=1).render(-100, 200).data[:, 0]
        np.testing.assert_allclose(y[:100], 0.0)
        assert np.abs(y[100:]).max() > 0

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            KarplusStrongPE(-1.0)
        with pytest.raises(ValueError):
            KarplusStrongPE(100.0, rho=1.5)


class TestComb:
    def test_impulse_echoes_at_period(self):
        comb = CombPE(DiracPE(), frequency=441.0, feedback=0.5)
        y = comb.render(0, 350).data[:, 0]
        assert y[0] == 1.0
        np.testing.assert_allclose(y[100], 0.5, atol=1e-5)
        np.testing.assert_allclose(y[200], 0.25, atol=1e-5)
        np.testing.assert_allclose(y[150], 0.0, atol=1e-6)

    def test_feedback_clamped(self):
        comb = CombPE(DiracPE(), frequency=441.0, feedback=2.0)
        y = comb.render(0, 2000).data
        assert np.isfinite(y).all()
        assert np.abs(y).max() < 50  # clamped at 0.995 → bounded growth


class TestLadder:
    def test_lowpass_passes_dc(self):
        step = ConstantPE(0.5)
        y = LadderPE(step, 2000.0, resonance=0.0).render(0, 4000).data[:, 0]
        np.testing.assert_allclose(y[-1], 0.5, atol=0.05)

    def test_cutoff_attenuates_high_freq(self):
        hi = SinePE(frequency=8000.0, amplitude=0.5)
        y = LadderPE(hi, 200.0, resonance=0.0).render(0, 8000).data[:, 0]
        assert np.abs(y[4000:]).max() < 0.01

    def test_modes_differ(self):
        src = SinePE(frequency=1000.0, amplitude=0.3)
        lp = LadderPE(src, 1000.0, 0.3, mode=LadderMode.LP24).render(0, 2000).data
        # fresh source graph for each (impure single-sink rule)
        src2 = SinePE(frequency=1000.0, amplitude=0.3)
        hp = LadderPE(src2, 1000.0, 0.3, mode=LadderMode.HP24).render(0, 2000).data
        assert not np.allclose(lp, hp, atol=1e-3)

    def test_resonance_self_oscillation_bounded(self):
        y = LadderPE(DiracPE(), 500.0, resonance=1.0).render(0, 8000).data
        assert np.isfinite(y).all()
        assert np.abs(y).max() < 4.0  # tanh-bounded


@pytest.mark.skipif(ref is None, reason="reference not available")
class TestParityPhysical:
    def _both(self, build, duration=1024, tol=1e-4):
        ref.set_sample_rate(SR)
        pg.set_sample_rate(SR)
        ours = build(pg).render(0, duration).data
        theirs = build(ref).render(0, duration).data
        np.testing.assert_allclose(ours, theirs, atol=tol)

    def test_ladder_parity(self):
        sig = np.random.default_rng(0).uniform(-0.5, 0.5, 1024).astype(np.float32)

        def build(m):
            return m.LadderPE(m.ArrayPE(sig), 1500.0, resonance=0.4)

        self._both(build, tol=5e-4)

    def test_ladder_swept_parity(self):
        sig = np.random.default_rng(1).uniform(-0.5, 0.5, 1024).astype(np.float32)

        def build(m):
            sweep = m.PiecewisePE([(0, 200.0), (1024, 6000.0)])
            return m.LadderPE(m.ArrayPE(sig), sweep, resonance=0.7)

        self._both(build, tol=5e-4)

    def test_comb_parity(self):
        sig = np.random.default_rng(2).uniform(-0.5, 0.5, 1024).astype(np.float32)

        def build(m):
            return m.CombPE(m.ArrayPE(sig), frequency=441.0, feedback=0.8)

        self._both(build, tol=2e-4)

    def test_karplus_parity(self):
        def build(m):
            return m.KarplusStrongPE(220.5, rho=0.98, seed=42)

        self._both(build, duration=2048, tol=2e-4)

    def test_timewarp_parity(self):
        sig = np.random.default_rng(3).uniform(-1, 1, 4000).astype(np.float32)

        def build(m):
            return m.TimeWarpPE(m.ArrayPE(sig), rate=1.3)

        self._both(build, duration=1500, tol=1e-4)

    def test_window_parity(self):
        sig = np.random.default_rng(4).uniform(-1, 1, 4000).astype(np.float32)

        for mode_name in ("MAX", "MEAN", "RMS", "MIN"):

            def build(m):
                return m.WindowPE(
                    m.ArrayPE(sig),
                    window=0.002,
                    mode=getattr(m.WindowMode, mode_name),
                )

            self._both(build, duration=1000, tol=1e-4)

    def test_wavetable_parity(self):
        table = np.sin(np.linspace(0, 2 * np.pi, 256)).astype(np.float32)
        idx = (np.arange(1000) * 2.7).astype(np.float32)

        def build(m):
            return m.WavetablePE(
                m.ArrayPE(table),
                m.ArrayPE(idx),
                out_of_bounds=m.OutOfBoundsMode.WRAP,
            )

        self._both(build, duration=1000, tol=1e-4)
