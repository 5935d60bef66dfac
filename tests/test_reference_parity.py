"""Golden parity vs the reference NumPy implementation.

Renders the same graphs through the reference (pure NumPy, imported from
/root/reference with stubbed host deps) and through pygmu2_tpu, and
compares samples to the ≤1e-4 budget (SURVEY.md §4 / BASELINE.json).
Skipped cleanly when the reference checkout is absent.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from tests.ref_oracle import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference not available")

SR = 44100
TOL = 1e-4


def both(build, start, duration):
    """build(mod) -> root PE; render via reference and ours, return pair."""
    ref.set_sample_rate(SR)
    pg.set_sample_rate(SR)
    ours = build(pg).render(start, duration).data
    theirs = build(ref).render(start, duration).data
    return ours, theirs


def assert_parity(build, start=0, duration=2048, tol=TOL):
    ours, theirs = both(build, start, duration)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=tol)


class TestSourceParity:
    def test_sine_pure(self):
        assert_parity(lambda m: m.SinePE(frequency=440.0, amplitude=0.7, phase=0.3))

    def test_sine_negative_start(self):
        assert_parity(lambda m: m.SinePE(frequency=997.0), start=-1000)

    def test_identity_dirac_constant(self):
        assert_parity(lambda m: m.IdentityPE())
        assert_parity(lambda m: m.DiracPE(), start=-4, duration=16)
        assert_parity(lambda m: m.ConstantPE(0.37, channels=2))

    def test_piecewise_linear(self):
        pts = [(0, 0.0), (500, 1.0), (700, -0.5), (2000, 0.25)]
        assert_parity(lambda m: m.PiecewisePE(pts))

    def test_piecewise_step_sigmoid(self):
        pts = [(0, 0.2), (300, 0.9), (1500, 0.1)]
        assert_parity(
            lambda m: m.PiecewisePE(pts, transition_type=m.TransitionType.STEP)
        )
        assert_parity(
            lambda m: m.PiecewisePE(pts, transition_type=m.TransitionType.SIGMOID)
        )


class TestTransformParity:
    def test_gain_mix_crop(self):
        def build(m):
            a = m.SinePE(frequency=440.0)
            b = m.SinePE(frequency=660.0, amplitude=0.5)
            return m.CropPE(m.MixPE(m.GainPE(a, 0.3), b), 100, 1500)

        assert_parity(build)

    def test_delay_int_float(self):
        def build_int(m):
            return m.DelayPE(m.SinePE(frequency=440.0), 250)

        def build_float(m):
            src = m.CropPE(m.SinePE(frequency=220.0), 0, 4000)
            return m.DelayPE(src, 10.25)

        assert_parity(build_int)
        assert_parity(build_float, duration=1024, tol=5e-4)

    def test_sequence(self):
        def build(m):
            a = m.CropPE(m.ConstantPE(1.0), 0, 100)
            b = m.CropPE(m.ConstantPE(2.0), 0, 100)
            return m.SequencePE((a, 0), (b, 50))

        assert_parity(build, duration=300)


class TestFilterParity:
    @pytest.mark.parametrize("mode_name", ["LOWPASS", "HIGHPASS", "BANDPASS", "PEAKING"])
    def test_biquad_constant(self, mode_name):
        sig = np.random.default_rng(0).uniform(-1, 1, 2048).astype(np.float32)

        def build(m):
            return m.BiquadPE(
                m.ArrayPE(sig),
                1200.0,
                3.0,
                mode=getattr(m.BiquadMode, mode_name),
                gain_db=5.0,
            )

        assert_parity(build, tol=2e-4)

    def test_biquad_swept(self):
        sig = np.random.default_rng(1).uniform(-1, 1, 2048).astype(np.float32)

        def build(m):
            sweep = m.PiecewisePE([(0, 300.0), (2048, 6000.0)])
            return m.BiquadPE(m.ArrayPE(sig), sweep, 2.0)

        assert_parity(build, tol=5e-4)

    @pytest.mark.parametrize("mode_name", ["LOWPASS", "HIGHPASS", "BANDPASS", "NOTCH"])
    def test_svf_constant(self, mode_name):
        sig = np.random.default_rng(2).uniform(-1, 1, 2048).astype(np.float32)

        def build(m):
            return m.SVFilterPE(
                m.ArrayPE(sig), 800.0, 2.5, mode=getattr(m.BiquadMode, mode_name)
            )

        assert_parity(build, tol=2e-4)

    def test_svf_swept(self):
        sig = np.random.default_rng(3).uniform(-1, 1, 1024).astype(np.float32)

        def build(m):
            sweep = m.PiecewisePE([(0, 200.0), (1024, 5000.0)])
            return m.SVFilterPE(m.ArrayPE(sig), sweep, 1.5)

        assert_parity(build, duration=1024, tol=5e-4)


class TestCompositionParity:
    """Whole-piece graphs through both implementations — the strongest
    end-to-end gate: multiple PE families interacting (scheduling,
    filters, dynamics, convolution) in one render."""

    def test_plucked_filtered_sequence(self):
        def build(m):
            parts = []
            for i, n in enumerate((57, 60, 64)):
                f = 220.0 * 2.0 ** ((n - 57) / 12.0)
                pluck = m.SlicePE(
                    m.KarplusStrongPE(f, rho=0.995, seed=i), 0, 1500
                )
                parts.append((pluck, i * 800))
            line = m.SequencePE(*parts)
            return m.BiquadPE(line, 3000.0, 0.9)

        assert_parity(build, duration=4000, tol=5e-4)

    def test_reverb_over_mixed_oscillators(self):
        def build(m):
            import numpy as np

            rng = np.random.default_rng(4)
            ir = (
                rng.uniform(-1, 1, 600)
                * np.exp(-np.arange(600) / 150.0)
            ).astype(np.float32)
            chord = m.MixPE(
                m.SinePE(frequency=220.0, amplitude=0.3),
                m.SinePE(frequency=277.18, amplitude=0.3),
            )
            dry = m.CropPE(chord, 0, 2500)
            return m.ReverbPE(dry, m.ArrayPE(ir), mix=0.4)

        assert_parity(build, duration=3000, tol=5e-4)

    def test_supersaw_through_compressor(self):
        # NB: a hard-gated source drives the reference's compressor to
        # NaN (log10 of an exactly-zero envelope); keep the source
        # non-silent for a meaningful comparison.
        def build(m):
            saw = m.SuperSawPE(110.0, voices=5, detune_cents=12.0, seed=6)
            body = m.CropPE(saw, 0, 4000)
            return m.CompressorPE(body, threshold=-18.0, ratio=5.0)

        assert_parity(build, duration=4000, tol=2e-3)

    def test_delay_feedback_texture(self):
        def build(m):
            ping = m.SlicePE(
                m.SinePE(frequency=660.0, amplitude=0.6), 0, 300,
                fade_out_seconds=0.002,
            )
            line = m.MixPE(
                ping,
                m.GainPE(m.DelayPE(ping, 700), 0.6),
                m.GainPE(m.DelayPE(ping, 1400), 0.36),
            )
            return m.SVFilterPE(line, 2500.0, 1.2)

        assert_parity(build, duration=2500, tol=5e-4)
