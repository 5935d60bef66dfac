"""Micro-edge coverage for the SoundFont subsystem's host surface:
SF2 / MIDI parse error paths, Channel controller semantics (14-bit
coarse/fine writes, RPN data entry, resets), and Synthesizer MIDI
dispatch edges.

Reference pattern: the reference exercises these in
tests/meltysynth/test_midi_file.py, test_soundfont.py and
synth/channel.py's doctest-style expectations (CONTRIBUTING.md:419-457
error-path convention).
"""

import io
import struct

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MidiFile,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from pygmu2_tpu.soundfont.midi import MeltysynthError
from tests.test_soundfont import build_midi
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


def _font():
    return build_sf2([
        {"data": make_looped_sample(261.63, harmonics=3), "rate": SR,
         "root_key": 60, "loop": True},
    ])


def _synth(font=None, block=64, poly=8):
    return Synthesizer(
        SoundFont(font or _font()),
        SynthesizerSettings(block_size=block, maximum_polyphony=poly),
    )


# ---------------------------------------------------------------------------
# SF2 parse errors


class TestSoundFontParseErrors:
    def test_not_riff(self):
        with pytest.raises(MeltysynthError, match="RIFF"):
            SoundFont(b"JUNKDATA" + b"\x00" * 64)

    def test_riff_wrong_form_type(self):
        data = b"RIFF" + struct.pack("<I", 8) + b"WAVE" + b"\x00" * 16
        with pytest.raises(MeltysynthError, match="sfbk"):
            SoundFont(data)

    def test_truncated_file(self):
        good = _font()
        with pytest.raises(MeltysynthError):
            SoundFont(good[: len(good) // 4])

    def test_empty_bytes(self):
        with pytest.raises(MeltysynthError):
            SoundFont(b"")

    def test_file_like_source(self):
        sf = SoundFont(io.BytesIO(_font()))
        assert len(sf.wave_data) > 0
        assert len(sf.presets) >= 1

    def test_device_wavetable_is_float32(self):
        """The model keeps f64 host-side; the device table ships f32."""
        s = _synth()
        assert np.asarray(s._wave).dtype == np.float32


# ---------------------------------------------------------------------------
# MIDI parse errors


class TestMidiParseErrors:
    def test_bad_header_magic(self):
        with pytest.raises(MeltysynthError, match="MThd"):
            MidiFile(b"XXXX" + b"\x00" * 32)

    def test_bad_header_length(self):
        data = b"MThd" + struct.pack(">I", 5) + b"\x00" * 5
        with pytest.raises(MeltysynthError):
            MidiFile(data)

    def test_unsupported_format_2(self):
        data = (
            b"MThd" + struct.pack(">I", 6)
            + struct.pack(">HHH", 2, 1, 480)
        )
        with pytest.raises(MeltysynthError, match="format"):
            MidiFile(data)

    def test_bad_track_magic(self):
        data = (
            b"MThd" + struct.pack(">I", 6)
            + struct.pack(">HHH", 0, 1, 480)
            + b"MTrX" + struct.pack(">I", 0)
        )
        with pytest.raises(MeltysynthError, match="MTrk"):
            MidiFile(data)

    def test_truncated_track(self):
        good = build_midi([(0.0, 0x90, 60, 100), (0.5, 0x80, 60, 0)])
        with pytest.raises(MeltysynthError):
            MidiFile(good[: len(good) - 4])

    def test_file_like_source(self):
        mf = MidiFile(io.BytesIO(
            build_midi([(0.0, 0x90, 60, 100), (0.5, 0x80, 60, 0)])
        ))
        assert mf.length > 0.4


# ---------------------------------------------------------------------------
# Channel controller semantics (via the dispatch surface)


class TestChannelControllers:
    def test_volume_coarse_fine_14bit(self):
        s = _synth()
        ch = s._channels[0]
        s.process_midi_message(0, 0xB0, 0x07, 100)  # coarse
        s.process_midi_message(0, 0xB0, 0x27, 55)   # fine
        assert ch._volume == (100 << 7) | 55
        assert ch.volume == pytest.approx(((100 << 7) | 55) / 16383.0)

    def test_pan_range(self):
        s = _synth()
        ch = s._channels[0]
        s.process_midi_message(0, 0xB0, 0x0A, 0)
        assert ch.pan == pytest.approx(-50.0)
        s.process_midi_message(0, 0xB0, 0x0A, 127)
        s.process_midi_message(0, 0xB0, 0x2A, 127)
        assert ch.pan == pytest.approx(50.0)

    def test_expression_default_full(self):
        # default is coarse-only 127: (127 << 7) / 16383
        s = _synth()
        assert s._channels[0].expression == pytest.approx((127 << 7) / 16383.0)

    def test_pitch_bend_center_and_extremes(self):
        s = _synth()
        ch = s._channels[0]
        s.process_midi_message(0, 0xE0, 0x00, 0x40)  # center: 8192
        assert ch._pitch_bend == pytest.approx(0.0)
        s.process_midi_message(0, 0xE0, 0x7F, 0x7F)  # max
        assert ch._pitch_bend == pytest.approx((16383 - 8192) / 8192.0)
        s.process_midi_message(0, 0xE0, 0x00, 0x00)  # min
        assert ch._pitch_bend == pytest.approx(-1.0)

    def test_rpn_pitch_bend_range(self):
        s = _synth()
        ch = s._channels[0]
        # RPN 0 (pitch bend range) -> data entry 12 semitones
        s.process_midi_message(0, 0xB0, 0x65, 0)  # RPN coarse
        s.process_midi_message(0, 0xB0, 0x64, 0)  # RPN fine
        s.process_midi_message(0, 0xB0, 0x06, 12)
        assert ch.pitch_bend_range == pytest.approx(12.0)

    def test_rpn_coarse_tune(self):
        s = _synth()
        ch = s._channels[0]
        s.process_midi_message(0, 0xB0, 0x65, 0)
        s.process_midi_message(0, 0xB0, 0x64, 2)  # RPN 2: coarse tune
        s.process_midi_message(0, 0xB0, 0x06, 66)  # +2 semitones
        assert ch.tune == pytest.approx(2.0)

    def test_data_entry_without_rpn_is_ignored(self):
        s = _synth()
        ch = s._channels[0]
        before = (ch.pitch_bend_range, ch.tune)
        s.process_midi_message(0, 0xB0, 0x06, 24)  # no RPN selected
        assert (ch.pitch_bend_range, ch.tune) == before

    def test_reset_all_controllers_keeps_volume_and_bank(self):
        """CC 121 resets modulation/expression/hold/bend but NOT volume,
        pan, or bank (reference channel.reset_all_controllers)."""
        s = _synth()
        ch = s._channels[0]
        s.process_midi_message(0, 0xB0, 0x07, 33)
        s.process_midi_message(0, 0xB0, 0x00, 5)
        s.process_midi_message(0, 0xB0, 0x01, 50)
        s.process_midi_message(0, 0xE0, 0x7F, 0x7F)
        s.process_midi_message(0, 0xB0, 0x79, 0)
        assert ch._volume == (33 << 7)
        assert ch.bank_number == 5
        assert ch._modulation == 0
        assert ch._pitch_bend == 0.0

    def test_hold_pedal_threshold_64(self):
        s = _synth()
        ch = s._channels[0]
        s.process_midi_message(0, 0xB0, 0x40, 63)
        assert not ch.hold_pedal
        s.process_midi_message(0, 0xB0, 0x40, 64)
        assert ch.hold_pedal

    def test_percussion_channel_default_bank(self):
        s = _synth()
        assert s._channels[9].bank_number == 128
        assert s._channels[0].bank_number == 0

    def test_reverb_chorus_sends_stored(self):
        s = _synth()
        ch = s._channels[0]
        s.process_midi_message(0, 0xB0, 0x5B, 77)
        s.process_midi_message(0, 0xB0, 0x5D, 33)
        assert ch._reverb_send == 77 and ch._chorus_send == 33


# ---------------------------------------------------------------------------
# Synthesizer dispatch edges


class TestDispatchEdges:
    def test_out_of_range_channel_ignored(self):
        s = _synth()
        s.process_midi_message(16, 0x90, 60, 100)  # no raise, no voice
        s.process_midi_message(-1, 0x90, 60, 100)
        assert s.active_voice_count == 0

    def test_note_on_velocity_zero_is_note_off(self):
        s = _synth()
        s.note_on(0, 60, 100)
        assert s.active_voice_count == 1
        s.note_on(0, 60, 0)  # velocity-0 note_on == note_off
        # the voice must have entered release (a release was requested)
        from pygmu2_tpu.soundfont.synthesizer import _NO_RELEASE

        assert (s._par["release_req"] != _NO_RELEASE).any()

    def test_note_on_unknown_patch_falls_back(self):
        s = _synth()
        s.process_midi_message(0, 0xC0, 99, 0)  # patch not in font
        s.note_on(0, 60, 100)  # falls back to default preset, no raise

    def test_note_off_without_note_on_is_noop(self):
        s = _synth()
        s.note_off(0, 60)
        assert s.active_voice_count == 0

    def test_all_sound_off_kills_immediately(self):
        s = _synth()
        s.note_on(0, 60, 100)
        s.note_on(0, 64, 100)
        assert s.active_voice_count == 2
        s.process_midi_message(0, 0xB0, 0x78, 0)  # CC 120
        assert s.active_voice_count == 0

    def test_program_change(self):
        s = _synth()
        s.process_midi_message(0, 0xC0, 3, 0)
        assert s._channels[0].patch_number == 3

    def test_reset_clears_voices_and_channels(self):
        s = _synth()
        s.process_midi_message(0, 0xB0, 0x07, 10)
        s.note_on(0, 60, 100)
        s.reset()
        assert s.active_voice_count == 0
        assert s._channels[0]._volume == (100 << 7)

    def test_active_voice_count_tracks_allocation(self):
        s = _synth(poly=8)
        keys = (60, 62, 64, 65, 67, 69, 71, 72)
        for i, k in enumerate(keys):
            s.note_on(0, k, 100)
            assert s.active_voice_count == i + 1
        # exceeding polyphony steals, never exceeds the cap
        s.note_on(0, 74, 100)
        assert s.active_voice_count == 8

    def test_settings_bounds_validated(self):
        with pytest.raises(MeltysynthError, match="block_size"):
            SynthesizerSettings(block_size=4)
        with pytest.raises(MeltysynthError, match="polyphony"):
            SynthesizerSettings(block_size=64, maximum_polyphony=4)
