"""Temperaments and conversion utilities.

Mirrors reference tests for temperament.py / conversions.py
(reference: temperament.py:17-667, conversions.py:21-281)."""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.utils.temperament import (
    CustomTemperament,
    EqualTemperament,
    JustIntonation,
    PythagoreanTuning,
    get_reference_frequency,
    get_temperament,
    set_reference_frequency,
    set_temperament,
)


class TestEqualTemperament:
    def test_a440(self):
        t = EqualTemperament()
        assert np.isclose(t.pitch_to_freq(69.0), 440.0)
        assert np.isclose(t.pitch_to_freq(81.0), 880.0)
        assert np.isclose(t.freq_to_pitch(440.0), 69.0)

    def test_roundtrip_vectorized(self):
        t = EqualTemperament()
        pitches = np.linspace(20, 100, 33)
        back = t.freq_to_pitch(t.pitch_to_freq(pitches))
        np.testing.assert_allclose(back, pitches, atol=1e-9)

    def test_19_tet(self):
        t = EqualTemperament(divisions=19)
        # one octave is 19 divisions
        assert np.isclose(
            t.pitch_to_freq(69.0 + 19) / t.pitch_to_freq(69.0), 2.0
        )

    def test_interval_ratio_roundtrip(self):
        t = EqualTemperament()
        np.testing.assert_allclose(t.interval_to_ratio(12.0), 2.0)
        np.testing.assert_allclose(t.ratio_to_interval(2.0), 12.0)


class TestJustIntonation:
    def test_perfect_fifth(self):
        t = JustIntonation()
        # 7 semitones above the reference pitch should be the 3/2 fifth
        ref = 60.0
        ratio = t.pitch_to_freq(ref + 7) / t.pitch_to_freq(ref)
        assert np.isclose(ratio, 1.5, atol=1e-6)

    def test_octave_exact(self):
        t = JustIntonation()
        assert np.isclose(
            t.pitch_to_freq(72.0) / t.pitch_to_freq(60.0), 2.0
        )


class TestPythagorean:
    def test_fifth_is_3_over_2(self):
        t = PythagoreanTuning()
        ratio = t.pitch_to_freq(67.0) / t.pitch_to_freq(60.0)
        assert np.isclose(ratio, 1.5, atol=1e-6)


class TestGlobals:
    def test_set_get_temperament(self):
        prev = get_temperament()
        try:
            t = EqualTemperament(19)
            set_temperament(t)
            assert get_temperament() is t
        finally:
            set_temperament(prev)

    def test_reference_frequency(self):
        prev = get_reference_frequency()  # (freq, pitch)
        try:
            set_reference_frequency(432.0)
            f = pg.pitch_to_freq(69)
            assert np.isclose(float(f), 432.0)
        finally:
            set_reference_frequency(*prev)


class TestConversions:
    def test_pitch_freq_roundtrip(self):
        p = np.array([60.0, 69.0, 72.5])
        np.testing.assert_allclose(
            pg.freq_to_pitch(pg.pitch_to_freq(p)), p, atol=1e-9
        )

    def test_db_ratio(self):
        np.testing.assert_allclose(pg.db_to_ratio(20.0), 10.0)
        np.testing.assert_allclose(pg.ratio_to_db(10.0), 20.0)
        np.testing.assert_allclose(pg.db_to_ratio(pg.ratio_to_db(0.37)), 0.37)

    def test_semitones_ratio(self):
        np.testing.assert_allclose(pg.semitones_to_ratio(12.0), 2.0)
        np.testing.assert_allclose(pg.ratio_to_semitones(2.0), 12.0)

    def test_samples_seconds(self):
        assert pg.seconds_to_samples(1.0, 44100) == 44100
        np.testing.assert_allclose(
            pg.samples_to_seconds(22050, 44100), 0.5
        )
