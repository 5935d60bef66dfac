"""Micro-edge coverage for the band-limited and function oscillators.

Mirrors the reference's oscillator test breadth (tests/
test_blit_saw_pe.py — 36 cases, test_super_saw_pe.py — 30,
test_analog_osc_pe.py, plus NoisePE edges): constructor/contract
checks, state continuity, auto-M selection, detune/mix-mode algebra,
and sample-rate sensitivity.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


@pytest.fixture(autouse=True)
def _sr():
    pg.set_sample_rate(SR)
    yield
    pg.set_sample_rate(SR)


# ---- BlitSawPE ------------------------------------------------------------


class TestBlitSawContracts:
    def test_constant_params_have_no_inputs(self):
        assert pg.BlitSawPE(frequency=220.0).inputs() == []

    def test_is_never_pure(self):
        # leaky integrator state (reference blit_saw_pe.py: stateful)
        assert not pg.BlitSawPE(frequency=220.0).is_pure()

    def test_infinite_extent(self):
        e = pg.BlitSawPE(frequency=220.0).extent()
        assert e.start is None and e.end is None

    def test_repr_auto_m(self):
        assert "m=auto" in repr(pg.BlitSawPE(frequency=220.0))

    def test_repr_fixed_m(self):
        assert "m=11" in repr(pg.BlitSawPE(frequency=220.0, m=11))

    def test_channels(self):
        out = pg.BlitSawPE(frequency=220.0, channels=2).render(0, 64)
        assert out.channels == 2

    def test_pe_frequency_input_listed(self):
        f = pg.ConstantPE(220.0)
        assert f in pg.BlitSawPE(frequency=f).inputs()

    def test_pe_amplitude_input_listed(self):
        a = pg.ConstantPE(0.5)
        assert a in pg.BlitSawPE(frequency=220.0, amplitude=a).inputs()


class TestBlitSawRender:
    def test_amplitude_scales_output(self):
        full = pg.BlitSawPE(frequency=220.0).render(0, 2048).data
        half = pg.BlitSawPE(frequency=220.0, amplitude=0.5).render(
            0, 2048
        ).data
        np.testing.assert_allclose(half, 0.5 * full, atol=1e-5)

    def test_fundamental_frequency(self):
        n = 8192
        out = pg.BlitSawPE(frequency=344.53125).render(0, n).data[:, 0]
        spec = np.abs(np.fft.rfft(out * np.hanning(n)))
        peak_hz = np.argmax(spec) * SR / n
        assert abs(peak_hz - 344.53125) < SR / n * 2

    def test_contiguous_renders_continuous(self):
        pe = pg.BlitSawPE(frequency=220.0)
        a = pe.render(0, 512).data
        b = pe.render(512, 512).data
        whole = pg.BlitSawPE(frequency=220.0).render(0, 1024).data
        np.testing.assert_allclose(np.vstack([a, b]), whole, atol=1e-6)

    def test_discontinuous_render_restarts(self):
        pe = pg.BlitSawPE(frequency=220.0)
        pe.render(0, 512)
        jumped = pe.render(10_000, 512).data
        fresh = pg.BlitSawPE(frequency=220.0).render(10_000, 512).data
        np.testing.assert_allclose(jumped, fresh, atol=1e-6)

    def test_negative_start_defined(self):
        out = pg.BlitSawPE(frequency=220.0).render(-256, 256).data
        assert np.isfinite(out).all()

    def test_single_sample(self):
        out = pg.BlitSawPE(frequency=220.0).render(0, 1).data
        assert out.shape == (1, 1) and np.isfinite(out).all()

    def test_bounded_output(self):
        out = pg.BlitSawPE(frequency=220.0).render(0, SR // 4).data
        assert np.abs(out).max() < 2.5

    def test_band_limited_no_alias_above_nyquist(self):
        # energy above Nyquist-safe harmonics should be far below the
        # fundamental (that's the point of BLIT vs naive saw)
        n = 16384
        f0 = 2205.0
        out = pg.BlitSawPE(frequency=f0).render(0, n).data[:, 0]
        spec = np.abs(np.fft.rfft(out * np.hanning(n)))
        freqs = np.fft.rfftfreq(n, 1 / SR)
        fund = spec[(freqs > f0 - 50) & (freqs < f0 + 50)].max()
        near_nyq = spec[freqs > SR / 2 - 500].max()
        assert near_nyq < 0.2 * fund

    def test_leak_shapes_dc_recovery(self):
        tight = pg.BlitSawPE(frequency=55.0, leak=0.9).render(
            0, SR // 2
        ).data
        loose = pg.BlitSawPE(frequency=55.0, leak=0.9999).render(
            0, SR // 2
        ).data
        assert not np.allclose(tight, loose, atol=1e-3)

    def test_sample_rate_48000(self):
        pg.set_sample_rate(48000)
        n = 8192
        out = pg.BlitSawPE(frequency=375.0).render(0, n).data[:, 0]
        spec = np.abs(np.fft.rfft(out * np.hanning(n)))
        peak_hz = np.argmax(spec) * 48000 / n
        assert abs(peak_hz - 375.0) < 48000 / n * 2

    def test_very_low_frequency(self):
        out = pg.BlitSawPE(frequency=2.0).render(0, 4096).data
        assert np.isfinite(out).all()


class TestBlitSawAutoM:
    def _m_ceiling(self, freq):
        # count partials visible in the spectrum
        n = 32768
        out = pg.BlitSawPE(frequency=freq).render(0, n).data[:, 0]
        spec = np.abs(np.fft.rfft(out * np.hanning(n)))
        freqs = np.fft.rfftfreq(n, 1 / SR)
        fund = spec[np.argmin(np.abs(freqs - freq))]
        k = 1
        while True:
            h = (k + 1) * freq
            if h > SR / 2:
                break
            if spec[np.argmin(np.abs(freqs - h))] < 1e-3 * fund:
                break
            k += 1
        return k

    def test_auto_m_low_frequency_many_harmonics(self):
        assert self._m_ceiling(110.0) > 50

    def test_auto_m_high_frequency_few_harmonics(self):
        assert self._m_ceiling(5000.0) <= 5

    def test_fixed_m_limits_spectrum(self):
        # fewer harmonics -> less energy in the upper band
        n = 16384

        def hf_energy(m):
            out = pg.BlitSawPE(frequency=430.66, m=m).render(0, n).data[:, 0]
            spec = np.abs(np.fft.rfft(out * np.hanning(n))) ** 2
            freqs = np.fft.rfftfreq(n, 1 / SR)
            return spec[freqs > 2000.0].sum()

        assert hf_energy(5) < 0.25 * hf_energy(31)


# ---- SuperSawPE -----------------------------------------------------------


class TestSuperSaw:
    def test_minimum_voices_clamped_to_one(self):
        # reference test_super_saw_pe.py:52 — voices clamps to >= 1
        a = pg.SuperSawPE(
            frequency=220.0, voices=0, randomize_phase=False
        ).render(0, 256).data
        b = pg.SuperSawPE(
            frequency=220.0, voices=1, randomize_phase=False
        ).render(0, 256).data
        np.testing.assert_allclose(a, b)

    def test_repr_mentions_voices(self):
        assert "voices=7" in repr(pg.SuperSawPE(frequency=220.0))

    def test_not_pure(self):
        assert not pg.SuperSawPE(frequency=220.0).is_pure()

    def test_single_voice_equals_blit_saw(self):
        ss = pg.SuperSawPE(
            frequency=220.0, voices=1, randomize_phase=False
        ).render(0, 512).data
        bl = pg.BlitSawPE(frequency=220.0).render(0, 512).data
        np.testing.assert_allclose(ss, bl, atol=1e-6)

    def test_zero_detune_collapses_to_unison(self):
        ss = pg.SuperSawPE(
            frequency=220.0, voices=5, detune_cents=0.0,
            randomize_phase=False,
        ).render(0, 1024).data
        one = pg.SuperSawPE(
            frequency=220.0, voices=1, randomize_phase=False
        ).render(0, 1024).data
        # all voices identical -> same normalized waveform shape
        np.testing.assert_allclose(
            ss / np.abs(ss).max(), one / np.abs(one).max(), atol=1e-3
        )

    def test_detune_produces_beating(self):
        n = 43 * 1024
        out = pg.SuperSawPE(
            frequency=220.0, voices=7, detune_cents=30.0, seed=3
        ).render(0, n).data[:, 0]
        env = np.abs(out).reshape(-1, 1024).max(axis=1)
        assert env.max() - env.min() > 0.1  # amplitude beats

    def test_seed_reproducible(self):
        a = pg.SuperSawPE(frequency=220.0, seed=5).render(0, 256).data
        b = pg.SuperSawPE(frequency=220.0, seed=5).render(0, 256).data
        np.testing.assert_allclose(a, b)

    def test_seeds_differ(self):
        a = pg.SuperSawPE(frequency=220.0, seed=5).render(0, 256).data
        b = pg.SuperSawPE(frequency=220.0, seed=6).render(0, 256).data
        assert not np.allclose(a, b)

    def test_unknown_mix_mode_rejected(self):
        with pytest.raises(ValueError):
            pg.SuperSawPE(frequency=220.0, mix_mode="loudest")

    def test_mix_modes_all_render(self):
        for mode in ("equal", "center_heavy", "linear"):
            out = pg.SuperSawPE(
                frequency=220.0, mix_mode=mode, seed=1
            ).render(0, 256).data
            assert np.isfinite(out).all() and np.abs(out).max() > 1e-3

    def test_output_bounded_after_normalization(self):
        out = pg.SuperSawPE(
            frequency=220.0, voices=7, detune_cents=40.0, seed=2
        ).render(0, SR // 2).data
        assert np.abs(out).max() < 3.0

    def test_contiguous_renders_continuous(self):
        pe = pg.SuperSawPE(frequency=220.0, seed=9)
        a = pe.render(0, 512).data
        b = pe.render(512, 512).data
        whole = pg.SuperSawPE(frequency=220.0, seed=9).render(0, 1024).data
        np.testing.assert_allclose(np.vstack([a, b]), whole, atol=1e-6)

    def test_vibrato_frequency_pe(self):
        lfo = pg.PiecewisePE([(0, 210.0), (SR, 230.0)])
        out = pg.SuperSawPE(frequency=lfo, seed=1).render(0, 2048).data
        assert np.isfinite(out).all() and np.abs(out).max() > 1e-3

    def test_stereo(self):
        out = pg.SuperSawPE(frequency=220.0, channels=2, seed=1).render(
            0, 128
        )
        assert out.channels == 2


# ---- AnalogOscPE / FunctionGenPE ------------------------------------------


class TestAnalogOsc:
    def test_pure_with_constants(self):
        assert pg.AnalogOscPE(frequency=100.0).is_pure()

    def test_infinite_extent(self):
        e = pg.AnalogOscPE(frequency=100.0).extent()
        assert e.start is None and e.end is None

    def test_waveform_validation(self):
        with pytest.raises(ValueError):
            pg.AnalogOscPE(frequency=100.0, waveform="sine")

    def test_rectangle_plateaus(self):
        # away from the band-limited edges the wave sits at +-1
        out = pg.AnalogOscPE(frequency=100.0).render(0, SR // 10).data[:, 0]
        frac_at_rails = np.mean(np.abs(np.abs(out) - 1.0) < 0.05)
        assert frac_at_rails > 0.6

    def test_duty_cycle_shifts_mean(self):
        wide = pg.AnalogOscPE(frequency=100.0, duty_cycle=0.8).render(
            0, SR // 5
        ).data.mean()
        narrow = pg.AnalogOscPE(frequency=100.0, duty_cycle=0.2).render(
            0, SR // 5
        ).data.mean()
        assert wide > narrow

    def test_stereo_channels_identical(self):
        out = pg.AnalogOscPE(frequency=100.0, channels=2).render(0, 256).data
        np.testing.assert_allclose(out[:, 0], out[:, 1])

    def test_duty_endpoints_no_nans(self):
        for duty in (0.0, 1.0):
            out = pg.AnalogOscPE(frequency=100.0, duty_cycle=duty).render(
                0, 1024
            ).data
            assert np.isfinite(out).all()


class TestFunctionGen:
    def test_sawtooth_at_half_duty_is_triangle(self):
        out = pg.FunctionGenPE(
            frequency=10.0, duty_cycle=0.5, waveform="sawtooth"
        ).render(0, SR // 10).data[:, 0]
        # triangle: slope magnitude constant, sign alternates
        d = np.diff(out)
        slopes = np.abs(d[np.abs(d) > 1e-7])
        assert slopes.std() / slopes.mean() < 0.2

    def test_low_frequency_control_range(self):
        out = pg.FunctionGenPE(frequency=2.0, waveform="sawtooth").render(
            0, SR
        ).data
        assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6

    def test_rectangle_mode(self):
        out = pg.FunctionGenPE(
            frequency=5.0, waveform="rectangle"
        ).render(0, SR // 2).data[:, 0]
        assert (np.abs(np.abs(out) - 1.0) < 0.05).mean() > 0.9

    def test_phase_offset_shifts_waveform(self):
        a = pg.FunctionGenPE(frequency=10.0, phase=0.0,
                             waveform="sawtooth").render(0, 512).data
        b = pg.FunctionGenPE(frequency=10.0, phase=0.5,
                             waveform="sawtooth").render(0, 512).data
        assert not np.allclose(a, b, atol=1e-3)

    def test_pe_frequency(self):
        f = pg.ConstantPE(3.0)
        out = pg.FunctionGenPE(frequency=f, waveform="sawtooth").render(
            0, 1024
        ).data
        assert np.isfinite(out).all()


# ---- NoisePE --------------------------------------------------------------


class TestNoise:
    def test_seed_reproducible(self):
        a = pg.NoisePE(seed=42).render(0, 256).data
        b = pg.NoisePE(seed=42).render(0, 256).data
        np.testing.assert_allclose(a, b)

    def test_seeds_differ(self):
        a = pg.NoisePE(seed=1).render(0, 256).data
        b = pg.NoisePE(seed=2).render(0, 256).data
        assert not np.allclose(a, b)

    def test_white_range_respected(self):
        out = pg.NoisePE(min_value=0.2, max_value=0.8, seed=1).render(
            0, 4096
        ).data
        assert out.min() >= 0.2 - 1e-6 and out.max() <= 0.8 + 1e-6

    def test_not_pure(self):
        assert not pg.NoisePE(seed=1).is_pure()

    def test_infinite_extent(self):
        e = pg.NoisePE(seed=1).extent()
        assert e.start is None and e.end is None

    def test_pink_spectrum_tilts_down(self):
        n = 1 << 15
        out = pg.NoisePE(seed=7, mode=pg.NoiseMode.PINK).render(
            0, n
        ).data[:, 0]
        spec = np.abs(np.fft.rfft(out)) ** 2
        freqs = np.fft.rfftfreq(n, 1 / SR)
        lo = spec[(freqs > 50) & (freqs < 200)].mean()
        hi = spec[(freqs > 5000) & (freqs < 20000)].mean()
        assert lo > 5 * hi

    def test_brown_spectrum_tilts_harder_than_pink(self):
        n = 1 << 15
        pink = pg.NoisePE(seed=7, mode=pg.NoiseMode.PINK).render(
            0, n
        ).data[:, 0]
        brown = pg.NoisePE(seed=7, mode=pg.NoiseMode.BROWN).render(
            0, n
        ).data[:, 0]

        def tilt(x):
            spec = np.abs(np.fft.rfft(x)) ** 2
            freqs = np.fft.rfftfreq(n, 1 / SR)
            lo = spec[(freqs > 50) & (freqs < 200)].mean()
            hi = spec[(freqs > 2000) & (freqs < 8000)].mean()
            return lo / hi

        assert tilt(brown) > 3 * tilt(pink)

    def test_contiguous_renders_continuous(self):
        pe = pg.NoisePE(seed=11)
        a = pe.render(0, 512).data
        b = pe.render(512, 512).data
        whole = pg.NoisePE(seed=11).render(0, 1024).data
        np.testing.assert_allclose(np.vstack([a, b]), whole, atol=1e-6)
