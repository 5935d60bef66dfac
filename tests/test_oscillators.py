"""BlitSaw / SuperSaw / AnalogOsc / FunctionGen / Portamento tests +
reference parity for the band-limited family."""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    AnalogOscPE,
    BlitSawPE,
    ConstantPE,
    FunctionGenPE,
    PiecewisePE,
    PortamentoPE,
    SuperSawPE,
)
from tests.ref_oracle import load_reference

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)

ref = load_reference()
SR = 44100


def spectrum(x, n=None):
    n = n or len(x)
    return np.abs(np.fft.rfft(x * np.hanning(len(x)), n=n))


class TestBlitSaw:
    def test_fundamental_present(self):
        y = BlitSawPE(frequency=441.0).render(0, 1 << 14).data[:, 0]
        spec = spectrum(y.astype(np.float64))
        freqs = np.fft.rfftfreq(1 << 14, 1 / SR)
        peak = freqs[np.argmax(spec[10:]) + 10]
        assert abs(peak - 441.0) < 10.0

    def test_bandlimited_no_alias_above_nyquist_fold(self):
        # naive saw at high f aliases; BLIT must roll off instead.
        n = 1 << 14
        y = BlitSawPE(frequency=5000.0).render(0, n).data[:, 0]
        spec = spectrum(y.astype(np.float64))
        freqs = np.fft.rfftfreq(n, 1 / SR)
        # energy at non-harmonic bins (e.g. 3 kHz) should be tiny
        non_harm = (freqs > 2800) & (freqs < 3200)
        harm1 = (freqs > 4800) & (freqs < 5200)
        assert spec[non_harm].max() < spec[harm1].max() * 1e-2

    def test_block_invariance(self):
        one = BlitSawPE(frequency=220.0, leak=0.995).render(0, 2000).data
        pe = BlitSawPE(frequency=220.0, leak=0.995)
        parts = [pe.render(i * 500, 500).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)

    def test_amplitude_scales(self):
        a = BlitSawPE(frequency=220.0, amplitude=1.0).render(0, 4000).data
        b = BlitSawPE(frequency=220.0, amplitude=0.5).render(0, 4000).data
        np.testing.assert_allclose(b, a * 0.5, atol=1e-5)


class TestSuperSaw:
    def test_detuned_thicker_than_single(self):
        n = 1 << 14
        single = SuperSawPE(220.0, voices=1).render(0, n).data[:, 0]
        seven = SuperSawPE(220.0, voices=7, detune_cents=25.0, seed=1).render(0, n).data[:, 0]
        s1 = spectrum(single.astype(np.float64))
        s7 = spectrum(seven.astype(np.float64))
        freqs = np.fft.rfftfreq(n, 1 / SR)
        band = (freqs > 210) & (freqs < 230)
        # detuned stack spreads energy across the band
        width1 = (s1[band] > s1[band].max() * 0.1).sum()
        width7 = (s7[band] > s7[band].max() * 0.1).sum()
        assert width7 > width1

    def test_mix_modes(self):
        for mode in (SuperSawPE.MIX_EQUAL, SuperSawPE.MIX_LINEAR, SuperSawPE.MIX_CENTER_HEAVY):
            y = SuperSawPE(220.0, voices=5, mix_mode=mode, seed=2).render(0, 1000).data
            assert np.isfinite(y).all()

    def test_bad_mix_mode(self):
        with pytest.raises(ValueError):
            SuperSawPE(220.0, mix_mode="bogus")


    def test_deterministic_by_seed(self):
        a = SuperSawPE(220.0, seed=5).render(0, 1000).data
        b = SuperSawPE(220.0, seed=5).render(0, 1000).data
        np.testing.assert_array_equal(a, b)


class TestAnalogOsc:
    def test_rectangle_mean_tracks_duty(self):
        y = AnalogOscPE(frequency=441.0, duty_cycle=0.25).render(0, 4400).data[:, 0]
        # mean of ±1 rectangle with duty d is 2d−1
        np.testing.assert_allclose(y.mean(), 2 * 0.25 - 1, atol=0.05)

    def test_blep_smooths_edges_vs_function_gen(self):
        # The polyBLEP residual replaces the naive ±1 jump with a smooth
        # multi-sample transition: intermediate values appear near edges.
        n = 4096
        f = 441.0
        naive = FunctionGenPE(frequency=f, waveform="rectangle").render(0, n).data[:, 0]
        blep = AnalogOscPE(frequency=f, waveform="rectangle").render(0, n).data[:, 0]
        # naive output is exactly two-valued; BLEP output is not
        assert len(np.unique(naive)) == 2
        mid = np.abs(np.abs(blep) - 1.0) > 0.1
        assert mid.sum() > 10
        # away from edges they agree
        agree = np.abs(blep - naive) < 0.05
        assert agree.mean() > 0.9

    def test_sawtooth_morph_runs(self):
        y = AnalogOscPE(frequency=220.0, duty_cycle=0.5, waveform="sawtooth").render(0, 4000).data
        assert np.isfinite(y).all()
        assert 0.8 < np.abs(y).max() < 1.3

    def test_modulated_block_invariance(self):
        def build():
            sweep = PiecewisePE([(0, 200.0), (2000, 800.0)])
            return AnalogOscPE(frequency=sweep, waveform="sawtooth")

        one = build().render(0, 2000).data
        pe = build()
        parts = [pe.render(i * 500, 500).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-4)


class TestPortamento:
    def test_holds_and_glides(self):
        notes = [(69.0, 0, 1000), (73.0, 1000, 1000)]
        pe = PortamentoPE(notes, max_ramp_seconds=0.005)  # ramp 220 samples
        y = pe.render(-100, 2600).data[:, 0]
        np.testing.assert_allclose(y[:1100], 69.0, atol=1e-5)  # pre + note0
        np.testing.assert_allclose(y[1500:], 73.0, atol=1e-5)  # post ramp
        # mid-ramp strictly between
        mid = y[1100 + 110]
        assert 69.0 < mid < 73.0

    def test_single_note(self):
        pe = PortamentoPE([(60.0, 100, 500)])
        y = pe.render(0, 1000).data[:, 0]
        np.testing.assert_allclose(y, 60.0, atol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            PortamentoPE([])
        with pytest.raises(ValueError):
            PortamentoPE([(60.0, 0, 100)], max_ramp_seconds=-1)


@pytest.mark.skipif(ref is None, reason="reference not available")
class TestParityOsc:
    def _both(self, build, duration=2048, tol=1e-4, start=0):
        ref.set_sample_rate(SR)
        pg.set_sample_rate(SR)
        ours = build(pg).render(start, duration).data
        theirs = build(ref).render(start, duration).data
        np.testing.assert_allclose(ours, theirs, atol=tol)

    def test_blit_saw_parity(self):
        self._both(lambda m: m.BlitSawPE(frequency=220.0, leak=0.999))

    def test_blit_saw_modulated_parity(self):
        def build(m):
            sweep = m.PiecewisePE([(0, 110.0), (2048, 880.0)])
            return m.BlitSawPE(frequency=sweep)

        self._both(build, tol=5e-4)

    def test_analog_osc_parity(self):
        self._both(
            lambda m: m.AnalogOscPE(frequency=330.0, duty_cycle=0.3), tol=2e-4
        )

    def test_analog_saw_parity(self):
        self._both(
            lambda m: m.AnalogOscPE(
                frequency=150.0, duty_cycle=0.5, waveform="sawtooth"
            ),
            tol=5e-4,
        )

    def test_function_gen_parity(self):
        self._both(
            lambda m: m.FunctionGenPE(frequency=441.0, duty_cycle=0.35)
        )
        self._both(
            lambda m: m.FunctionGenPE(
                frequency=220.5, duty_cycle=0.5, waveform="sawtooth"
            ),
            tol=2e-4,
        )

    def test_supersaw_no_random_phase_parity(self):
        def build(m):
            return m.SuperSawPE(
                220.0, voices=5, detune_cents=15.0, randomize_phase=False
            )

        self._both(build, tol=5e-4)
