"""SoundFont math-utility and model-surface coverage.

Mirrors the reference's meltysynth utility tests (reference:
tests/test_meltysynth.py:36-235): unit conversions, clamp/exp_cutoff
semantics, enum wire values, version struct, load errors, settings
validation, and note-on/silent render basics.
"""

import math

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MeltysynthError,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont import params as sp
from pygmu2_tpu.soundfont.model import (
    GeneratorType,
    LoopMode,
    SampleType,
    SoundFontVersion,
)
from tests.sf2_builder import build_sf2, make_looped_sample


def build_simple_sf2() -> bytes:
    return build_sf2(
        [{"data": make_looped_sample(261.63), "rate": 44100,
          "root_key": 60, "loop": True}]
    )


class TestUnitConversions:
    def test_timecents_to_seconds_zero_is_one_second(self):
        assert sp.timecents_to_seconds(0.0) == pytest.approx(1.0)

    def test_timecents_to_seconds_1200_doubles(self):
        assert sp.timecents_to_seconds(1200.0) == pytest.approx(2.0)

    def test_timecents_to_seconds_negative_halves(self):
        assert sp.timecents_to_seconds(-1200.0) == pytest.approx(0.5)

    def test_cents_to_hertz_zero_is_8_176(self):
        # 0 absolute cents == 8.176 Hz (MIDI key -inf anchor)
        assert sp.cents_to_hertz(0.0) == pytest.approx(8.176, rel=1e-3)

    def test_cents_to_hertz_each_1200_doubles(self):
        assert sp.cents_to_hertz(1200.0) == pytest.approx(
            2 * sp.cents_to_hertz(0.0)
        )

    def test_cents_to_multiplying_factor_zero(self):
        assert sp.cents_to_multiplying_factor(0.0) == pytest.approx(1.0)

    def test_cents_to_multiplying_factor_octave(self):
        assert sp.cents_to_multiplying_factor(1200.0) == pytest.approx(2.0)

    def test_decibels_to_linear_zero_db(self):
        assert sp.decibels_to_linear(0.0) == pytest.approx(1.0)

    def test_decibels_to_linear_20db(self):
        assert sp.decibels_to_linear(20.0) == pytest.approx(10.0)

    def test_linear_to_decibels_one(self):
        assert sp.linear_to_decibels(1.0) == pytest.approx(0.0)

    def test_linear_decibels_roundtrip(self):
        for v in (0.1, 0.5, 2.0):
            assert sp.decibels_to_linear(sp.linear_to_decibels(v)) == (
                pytest.approx(v, rel=1e-6)
            )

    def test_key_number_factor_at_reference_key_60(self):
        assert sp.key_number_to_multiplying_factor(1200, 60) == pytest.approx(1.0)


class TestClampAndCutoff:
    def test_clamp_in_range(self):
        assert sp.clamp(5, 0, 10) == 5

    def test_clamp_below_min(self):
        assert sp.clamp(-3, 0, 10) == 0

    def test_clamp_above_max(self):
        assert sp.clamp(42, 0, 10) == 10

    def test_clamp_floats(self):
        assert sp.clamp(0.25, 0.0, 1.0) == pytest.approx(0.25)

    def test_exp_cutoff_above_threshold_is_exp(self):
        assert sp.exp_cutoff(0.0) == pytest.approx(1.0)
        assert sp.exp_cutoff(1.0) == pytest.approx(math.e)

    def test_exp_cutoff_below_threshold_is_zero(self):
        # deep negative exponents cut to silence instead of denormals
        assert sp.exp_cutoff(-300.0) == 0.0


class TestModelEnums:
    def test_generator_sample_id_value(self):
        assert GeneratorType.SAMPLE_ID == 53

    def test_generator_key_range_value(self):
        assert GeneratorType.KEY_RANGE == 43

    def test_loop_mode_wire_values(self):
        assert LoopMode.NO_LOOP == 0
        assert LoopMode.CONTINUOUS == 1
        assert LoopMode.LOOP_UNTIL_NOTE_OFF == 3

    def test_sample_type_mono(self):
        assert SampleType.MONO == 1

    def test_version_fields(self):
        v = SoundFontVersion(major=2, minor=1)
        assert v.major == 2 and v.minor == 1


class TestSoundFontLoad:
    def test_invalid_bytes_raises(self):
        with pytest.raises(MeltysynthError):
            SoundFont(b"not a soundfont at all")

    def test_from_file_loads(self, tmp_path):
        path = tmp_path / "t.sf2"
        path.write_bytes(build_simple_sf2())
        font = SoundFont.from_file(str(path))
        assert len(font.presets) >= 1
        assert font.sample_headers

    def test_from_file_missing_raises(self, tmp_path):
        with pytest.raises((FileNotFoundError, OSError)):
            SoundFont.from_file(str(tmp_path / "missing.sf2"))

    def test_info_version_populated(self):
        font = SoundFont(build_simple_sf2())
        assert font.info.version.major >= 2


class TestSynthesizerSettingsSurface:
    def test_values_stored(self):
        s = SynthesizerSettings(
            sample_rate=22050, block_size=128, maximum_polyphony=9
        )
        assert s.sample_rate == 22050
        assert s.block_size == 128
        assert s.maximum_polyphony == 9

    def test_defaults(self):
        s = SynthesizerSettings()
        assert s.sample_rate == 44100
        assert s.block_size == 64
        assert s.maximum_polyphony >= 8

    def test_invalid_sample_rate_raises(self):
        with pytest.raises((ValueError, MeltysynthError)):
            SynthesizerSettings(sample_rate=1000)


class TestSynthesizerRenderBasics:
    def _synth(self):
        return Synthesizer(
            SoundFont(build_simple_sf2()),
            SynthesizerSettings(sample_rate=44100, block_size=64,
                                maximum_polyphony=8),
        )

    def test_note_on_produces_audio(self):
        synth = self._synth()
        synth.note_on(0, 60, 100)
        out = synth.render_stereo(256)
        assert float(np.abs(out[:, 0]).max()) > 0.0
        assert float(np.abs(out[:, 1]).max()) > 0.0

    def test_render_without_note_on_is_silent(self):
        out = self._synth().render_stereo(256)
        np.testing.assert_array_equal(out, 0.0)

    def test_render_buffer_length_mismatch_raises(self):
        synth = self._synth()
        with pytest.raises(MeltysynthError, match="same length"):
            synth.render(np.zeros(64, np.float32), np.zeros(32, np.float32))

    def test_render_offset_and_count_window(self):
        synth = self._synth()
        synth.note_on(0, 60, 100)
        left = np.full(128, -7.0, np.float32)
        right = np.full(128, -7.0, np.float32)
        synth.render(left, right, offset=32, count=64)
        np.testing.assert_array_equal(left[:32], -7.0)   # untouched
        np.testing.assert_array_equal(left[96:], -7.0)   # untouched
        assert np.any(left[32:96] != -7.0)
