"""Micro-edge coverage for music utilities.

Mirrors the reference's two largest utility test files
(tests/test_conversions.py — 38 cases, tests/test_temperament.py — 48
cases): exact anchor frequencies, roundtrips, array/scalar duality,
zero-protection, every temperament class, and the global
temperament/reference-frequency configuration.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.utils import conversions as cv
from pygmu2_tpu.utils.temperament import (
    CustomTemperament,
    EqualTemperament,
    JustIntonation,
    PythagoreanTuning,
    get_reference_frequency,
    get_temperament,
    set_baroque_pitch,
    set_concert_pitch,
    set_reference_frequency,
    set_temperament,
    set_verdi_tuning,
)

pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


@pytest.fixture(autouse=True)
def _reset_tuning():
    yield
    set_temperament(EqualTemperament())
    set_reference_frequency(440.0)
    pg.set_sample_rate(44100)


# ---- pitch <-> frequency --------------------------------------------------


class TestPitchFreq:
    def test_a4_is_440(self):
        assert cv.pitch_to_freq(69) == pytest.approx(440.0)

    def test_middle_c(self):
        assert cv.pitch_to_freq(60) == pytest.approx(261.6256, abs=1e-3)

    def test_octave_doubles(self):
        assert cv.pitch_to_freq(81) == pytest.approx(880.0)

    def test_array_input(self):
        out = cv.pitch_to_freq(np.array([69.0, 81.0]))
        np.testing.assert_allclose(out, [440.0, 880.0], rtol=1e-6)

    def test_freq_to_pitch_440(self):
        assert cv.freq_to_pitch(440.0) == pytest.approx(69.0)

    def test_freq_to_pitch_middle_c(self):
        assert cv.freq_to_pitch(261.6256) == pytest.approx(60.0, abs=1e-3)

    def test_freq_to_pitch_array(self):
        out = cv.freq_to_pitch(np.array([440.0, 220.0]))
        np.testing.assert_allclose(out, [69.0, 57.0], rtol=1e-6)

    def test_roundtrip_pitch(self):
        for p in (0.0, 21.5, 60.0, 69.0, 127.0):
            assert cv.freq_to_pitch(cv.pitch_to_freq(p)) == pytest.approx(p)

    def test_roundtrip_freq(self):
        for f in (27.5, 261.63, 440.0, 4186.0):
            assert cv.pitch_to_freq(cv.freq_to_pitch(f)) == pytest.approx(f)

    def test_zero_freq_protected(self):
        out = cv.freq_to_pitch(0.0)
        assert np.isfinite(out)


# ---- ratio <-> dB ---------------------------------------------------------


class TestRatioDb:
    def test_unity_is_zero_db(self):
        assert cv.ratio_to_db(1.0) == pytest.approx(0.0)

    def test_double_is_6db(self):
        assert cv.ratio_to_db(2.0) == pytest.approx(6.0206, abs=1e-3)

    def test_half_is_minus_6db(self):
        assert cv.ratio_to_db(0.5) == pytest.approx(-6.0206, abs=1e-3)

    def test_ten_is_20db(self):
        assert cv.ratio_to_db(10.0) == pytest.approx(20.0)

    def test_array(self):
        np.testing.assert_allclose(
            cv.ratio_to_db(np.array([1.0, 10.0])), [0.0, 20.0], atol=1e-9
        )

    def test_db_to_ratio_zero(self):
        assert cv.db_to_ratio(0.0) == pytest.approx(1.0)

    def test_db_to_ratio_20(self):
        assert cv.db_to_ratio(20.0) == pytest.approx(10.0)

    def test_db_to_ratio_negative(self):
        assert cv.db_to_ratio(-20.0) == pytest.approx(0.1)

    def test_roundtrip(self):
        for r in (0.01, 0.5, 1.0, 3.3, 100.0):
            assert cv.db_to_ratio(cv.ratio_to_db(r)) == pytest.approx(r)

    def test_zero_ratio_protected(self):
        assert np.isfinite(cv.ratio_to_db(0.0))


# ---- semitones <-> ratio --------------------------------------------------


class TestSemitonesRatio:
    def test_octave_up(self):
        assert cv.semitones_to_ratio(12.0) == pytest.approx(2.0)

    def test_fifth(self):
        assert cv.semitones_to_ratio(7.0) == pytest.approx(1.49831, abs=1e-4)

    def test_zero(self):
        assert cv.semitones_to_ratio(0.0) == pytest.approx(1.0)

    def test_negative_octave(self):
        assert cv.semitones_to_ratio(-12.0) == pytest.approx(0.5)

    def test_ratio_to_semitones_octave(self):
        assert cv.ratio_to_semitones(2.0) == pytest.approx(12.0)

    def test_ratio_to_semitones_down(self):
        assert cv.ratio_to_semitones(0.5) == pytest.approx(-12.0)

    def test_roundtrip(self):
        for s in (-24.0, -1.0, 0.0, 7.0, 19.0):
            assert cv.ratio_to_semitones(
                cv.semitones_to_ratio(s)
            ) == pytest.approx(s)

    def test_zero_ratio_protected(self):
        assert np.isfinite(cv.ratio_to_semitones(0.0))


# ---- samples <-> seconds --------------------------------------------------


class TestSampleTime:
    def test_one_second(self):
        assert cv.samples_to_seconds(44100, 44100) == pytest.approx(1.0)

    def test_half_second(self):
        assert cv.samples_to_seconds(22050, 44100) == pytest.approx(0.5)

    def test_seconds_to_samples(self):
        assert cv.seconds_to_samples(1.0, 44100) == 44100

    def test_seconds_to_samples_rounds(self):
        assert cv.seconds_to_samples(0.5, 44100) == 22050

    def test_roundtrip(self):
        n = cv.seconds_to_samples(0.25, 48000)
        assert cv.samples_to_seconds(n, 48000) == pytest.approx(0.25)

    def test_array(self):
        out = cv.samples_to_seconds(np.array([44100, 88200]), 44100)
        np.testing.assert_allclose(out, [1.0, 2.0])


# ---- EqualTemperament -----------------------------------------------------


class TestEqualTemperament:
    def test_12et_a4(self):
        assert EqualTemperament().pitch_to_freq(69) == pytest.approx(440.0)

    def test_12et_middle_c(self):
        assert EqualTemperament().pitch_to_freq(60) == pytest.approx(
            261.6256, abs=1e-3
        )

    def test_12et_octave_doubles(self):
        et = EqualTemperament()
        assert et.pitch_to_freq(72) == pytest.approx(
            2 * et.pitch_to_freq(60)
        )

    def test_12et_freq_to_pitch_roundtrip(self):
        et = EqualTemperament()
        assert et.freq_to_pitch(et.pitch_to_freq(64.5)) == pytest.approx(64.5)

    def test_interval_to_ratio_octave(self):
        assert EqualTemperament().interval_to_ratio(12) == pytest.approx(2.0)

    def test_interval_to_ratio_fifth(self):
        assert EqualTemperament().interval_to_ratio(7) == pytest.approx(
            1.49831, abs=1e-4
        )

    def test_ratio_to_interval_roundtrip(self):
        et = EqualTemperament()
        assert et.ratio_to_interval(et.interval_to_ratio(5)) == pytest.approx(5)

    def test_19et_octave_is_19_divisions(self):
        et = EqualTemperament(divisions=19)
        assert et.interval_to_ratio(19) == pytest.approx(2.0)

    def test_19et_step_smaller_than_12et(self):
        assert EqualTemperament(19).interval_to_ratio(1) < EqualTemperament(
            12
        ).interval_to_ratio(1)

    def test_24et_quarter_tone(self):
        q = EqualTemperament(24).interval_to_ratio(1)
        assert q == pytest.approx(2 ** (1 / 24))

    def test_invalid_divisions_rejected(self):
        with pytest.raises(ValueError):
            EqualTemperament(divisions=0)

    def test_name_mentions_divisions(self):
        assert "19" in EqualTemperament(19).name()

    def test_array_pitch_to_freq(self):
        out = EqualTemperament().pitch_to_freq(np.array([69.0, 81.0]))
        np.testing.assert_allclose(out, [440.0, 880.0], rtol=1e-6)


# ---- JustIntonation -------------------------------------------------------


class TestJustIntonation:
    def test_unison_ratio(self):
        assert JustIntonation().interval_to_ratio(0) == pytest.approx(1.0)

    def test_octave_ratio(self):
        assert JustIntonation().interval_to_ratio(12) == pytest.approx(2.0)

    def test_perfect_fifth_3_2(self):
        assert JustIntonation().interval_to_ratio(7) == pytest.approx(1.5)

    def test_major_third_5_4(self):
        assert JustIntonation().interval_to_ratio(4) == pytest.approx(1.25)

    def test_perfect_fourth_4_3(self):
        assert JustIntonation().interval_to_ratio(5) == pytest.approx(4 / 3)

    def test_reference_pitch_anchored_by_just_interval_from_a440(self):
        # C4 sits a just major sixth (5/3) below A4=440 -> 264 Hz
        ji = JustIntonation(reference_pitch=60.0)
        assert ji.pitch_to_freq(60.0) == pytest.approx(264.0)

    def test_custom_ratios(self):
        ji = JustIntonation(ratios=[1.0, 1.5])
        assert ji.interval_to_ratio(1) == pytest.approx(1.5)
        assert ji.interval_to_ratio(2) == pytest.approx(2.0)  # octave fold

    def test_invalid_ratios_rejected(self):
        with pytest.raises(ValueError):
            JustIntonation(ratios=[])

    def test_array_interval_to_ratio(self):
        out = JustIntonation().interval_to_ratio(np.array([0, 7, 12]))
        np.testing.assert_allclose(out, [1.0, 1.5, 2.0])

    def test_name(self):
        assert "Just" in JustIntonation().name()


# ---- PythagoreanTuning ----------------------------------------------------


class TestPythagorean:
    def test_perfect_fifth_exact_3_2(self):
        assert PythagoreanTuning().interval_to_ratio(7) == pytest.approx(1.5)

    def test_perfect_fourth_4_3(self):
        assert PythagoreanTuning().interval_to_ratio(5) == pytest.approx(4 / 3)

    def test_octave(self):
        assert PythagoreanTuning().interval_to_ratio(12) == pytest.approx(2.0)

    def test_major_third_sharper_than_just(self):
        assert PythagoreanTuning().interval_to_ratio(
            4
        ) > JustIntonation().interval_to_ratio(4)

    def test_name(self):
        assert "Pythag" in PythagoreanTuning().name()


# ---- CustomTemperament ----------------------------------------------------


class TestCustomTemperament:
    def _linear(self):
        # custom funcs receive (value, reference_pitch, reference_freq),
        # same contract as reference temperament.py:471-482
        return CustomTemperament(
            pitch_to_freq_func=lambda p, rp, rf: 10.0 * np.asarray(p),
            freq_to_pitch_func=lambda f, rp, rf: np.asarray(f) / 10.0,
            interval_to_ratio_func=lambda i: 1.0 + 0.1 * np.asarray(i),
            ratio_to_interval_func=lambda r: (np.asarray(r) - 1.0) / 0.1,
            name="Linear",
        )

    def test_custom_functions_used(self):
        t = self._linear()
        assert t.pitch_to_freq(60) == pytest.approx(600.0)
        assert t.freq_to_pitch(600.0) == pytest.approx(60.0)
        assert t.interval_to_ratio(5) == pytest.approx(1.5)

    def test_name(self):
        assert self._linear().name() == "Linear"


# ---- global temperament configuration ------------------------------------


class TestGlobalTemperament:
    def test_default_is_12et(self):
        t = get_temperament()
        assert t.interval_to_ratio(12) == pytest.approx(2.0)
        assert t.pitch_to_freq(69) == pytest.approx(440.0)

    def test_set_and_get(self):
        ji = JustIntonation()
        set_temperament(ji)
        assert get_temperament() is ji

    def test_conversions_use_global(self):
        set_temperament(JustIntonation())
        assert cv.semitones_to_ratio(7) == pytest.approx(1.5)
        assert cv.ratio_to_semitones(1.5) == pytest.approx(7.0)

    def test_explicit_temperament_overrides_global(self):
        set_temperament(JustIntonation())
        out = cv.semitones_to_ratio(7, temperament=EqualTemperament())
        assert out == pytest.approx(1.49831, abs=1e-4)

    def test_pitch_to_freq_with_temperament_kwarg(self):
        ji = JustIntonation(reference_pitch=60.0)
        out = cv.pitch_to_freq(67, temperament=ji)
        assert out == pytest.approx(1.5 * float(ji.pitch_to_freq(60.0)))


class TestReferenceFrequency:
    def test_default_440(self):
        freq, pitch = get_reference_frequency()
        assert freq == pytest.approx(440.0) and pitch == pytest.approx(69.0)

    def test_set_reference(self):
        set_reference_frequency(442.0)
        assert get_reference_frequency()[0] == pytest.approx(442.0)
        assert cv.pitch_to_freq(69) == pytest.approx(442.0)

    def test_verdi_tuning(self):
        set_verdi_tuning()
        assert cv.pitch_to_freq(69) == pytest.approx(432.0)

    def test_baroque_pitch(self):
        set_baroque_pitch()
        assert cv.pitch_to_freq(69) == pytest.approx(415.0)

    def test_concert_pitch_restores(self):
        set_verdi_tuning()
        set_concert_pitch()
        assert cv.pitch_to_freq(69) == pytest.approx(440.0)

    def test_invalid_reference_rejected(self):
        with pytest.raises(ValueError):
            set_reference_frequency(0.0)

    def test_octaves_scale_with_reference(self):
        set_reference_frequency(432.0)
        assert cv.pitch_to_freq(81) == pytest.approx(864.0)
