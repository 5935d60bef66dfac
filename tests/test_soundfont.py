"""SoundFont subsystem: parser, MIDI file, synthesizer — incl. golden
parity against the reference meltysynth on identical synthetic SF2 bytes."""

import io
import struct

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MidiFile,
    MidiFileSequencer,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from tests.ref_oracle import load_reference
from tests.sf2_builder import build_sf2, make_looped_sample

ref = load_reference()
SR = 44100


def build_midi(events, resolution=480, tempo_bpm=120):
    """events: list of (time_seconds, status, data1, data2), time-sorted
    (a negative delta would loop varint forever)."""
    assert all(a[0] <= b[0] for a, b in zip(events, events[1:])), (
        "build_midi requires time-sorted events"
    )
    body = b""
    tick_per_sec = resolution * tempo_bpm / 60.0
    last_tick = 0

    def varint(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append(0x80 | (v & 0x7F))
            v >>= 7
        return bytes(reversed(out))

    for t, status, d1, d2 in events:
        tick = int(round(t * tick_per_sec))
        body += varint(tick - last_tick)
        last_tick = tick
        if status & 0xF0 in (0xC0, 0xD0):
            body += bytes([status, d1])
        else:
            body += bytes([status, d1, d2])
    body += varint(0) + b"\xff\x2f\x00"
    track = b"MTrk" + struct.pack(">i", len(body)) + body
    header = b"MThd" + struct.pack(">ihhh", 6, 0, 1, resolution)
    return header + track


class TestSF2Parser:
    def test_basic_structure(self):
        font = SoundFont(build_sf2())
        assert len(font.presets) == 1
        assert len(font.instruments) == 1
        assert len(font.sample_headers) == 1
        assert font.info.bank_name == "TestFont"
        assert font.presets[0].regions[0].instrument is font.instruments[0]

    def test_parser_matches_reference(self):
        data = build_sf2(
            [
                {
                    "data": make_looped_sample(261.63),
                    "rate": 44100,
                    "root_key": 60,
                    "loop": True,
                    "attack_tc": -7000,
                    "release_tc": -5000,
                    "key_lo": 0,
                    "key_hi": 127,
                },
                {
                    "data": make_looped_sample(440.0),
                    "rate": 22050,
                    "root_key": 69,
                    "loop": False,
                    "patch": 1,
                },
            ]
        )
        ours = SoundFont(data)
        if ref is None:
            pytest.skip("reference not available")
        theirs = ref.__class__  # noqa - imported below properly
        from pygmu2.meltysynth import SoundFont as RefSoundFont

        rf = RefSoundFont(io.BytesIO(data))
        assert len(ours.presets) == len(rf.presets)
        assert len(ours.instruments) == len(rf.instruments)
        np.testing.assert_allclose(ours.wave_data, np.asarray(rf.wave_data))
        for o_i, r_i in zip(ours.instruments, rf.instruments):
            assert o_i.name == r_i.name
            for o_r, r_r in zip(o_i.regions, r_i.regions):
                assert o_r.sample_start == r_r.sample_start
                assert o_r.sample_end == r_r.sample_end
                assert o_r.sample_start_loop == r_r.sample_start_loop
                assert o_r.sample_end_loop == r_r.sample_end_loop
                assert o_r.root_key == r_r.root_key
                assert int(o_r.sample_modes) == int(r_r.sample_modes)
                np.testing.assert_array_equal(o_r._gs, np.asarray(r_r._gs))


class TestMidiFile:
    def test_parse_and_times(self):
        data = build_midi(
            [
                (0.0, 0x90, 60, 100),
                (0.5, 0x90, 64, 100),
                (1.0, 0x80, 60, 0),
                (1.5, 0x80, 64, 0),
            ]
        )
        mf = MidiFile(data)
        assert len(mf.messages) >= 4
        np.testing.assert_allclose(mf.times[:4], [0.0, 0.5, 1.0, 1.5], atol=1e-6)
        assert mf.length == pytest.approx(1.5, abs=1e-6)

    def test_matches_reference(self):
        if ref is None:
            pytest.skip("reference not available")
        from pygmu2.meltysynth import MidiFile as RefMidiFile

        data = build_midi(
            [(0.0, 0x90, 60, 100), (0.25, 0xB0, 7, 90), (2.0, 0x80, 60, 0)]
        )
        ours = MidiFile(data)
        theirs = RefMidiFile(io.BytesIO(data))
        assert len(ours.messages) == len(theirs._messages)
        np.testing.assert_allclose(ours.times, theirs._times, atol=1e-9)


class TestSynthesizer:
    def _chord_events(self):
        return [
            (0.0, 0x90, 60, 100),
            (0.0, 0x90, 64, 100),
            (0.0, 0x90, 67, 100),
            (1.0, 0x80, 60, 0),
            (1.0, 0x80, 64, 0),
            (1.0, 0x80, 67, 0),
        ]

    def test_note_renders_audio(self):
        synth = Synthesizer(SoundFont(build_sf2()), SynthesizerSettings())
        synth.note_on(0, 60, 100)
        out = synth.render_stereo(4096)
        assert np.isfinite(out).all()
        assert np.abs(out).max() > 0.01
        assert synth.active_voice_count == 1

    def test_note_off_decays(self):
        font = SoundFont(build_sf2([{
            "data": make_looped_sample(), "rate": 44100, "root_key": 60,
            "loop": True, "release_tc": -8000,
        }]))
        synth = Synthesizer(font)
        synth.note_on(0, 60, 100)
        synth.render_stereo(4410)
        synth.note_off(0, 60)
        out = synth.render_stereo(SR)
        assert np.abs(out[:2205]).max() > 0.001
        assert np.abs(out[-4410:]).max() < 1e-4

    def test_pitch_follows_key(self):
        font = SoundFont(build_sf2())
        for key, expect_f in [(60, None), (72, None)]:
            synth = Synthesizer(font)
            synth.note_on(0, key, 100)
            out = synth.render_stereo(1 << 14)[:, 0]
            spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
            freqs = np.fft.rfftfreq(len(out), 1 / SR)
            peak = freqs[np.argmax(spec)]
            if key == 60:
                f60 = peak
            else:
                assert abs(peak / f60 - 2.0) < 0.05  # octave up

    def test_sequencer_offline_matches_streaming(self):
        font_bytes = build_sf2()
        midi = MidiFile(build_midi(self._chord_events()))

        synth1 = Synthesizer(SoundFont(font_bytes))
        seq = MidiFileSequencer(synth1)
        seq.play(midi)
        n = SR  # 1 second
        left = np.zeros(n, np.float32)
        right = np.zeros(n, np.float32)
        seq.render(left, right)
        streamed = np.stack([left, right], axis=1)

        synth2 = Synthesizer(SoundFont(font_bytes))
        seq2 = MidiFileSequencer(synth2)
        seq2.play(midi)
        offline = seq2.render_to_array(1.0)

        np.testing.assert_allclose(offline, streamed, atol=2e-5)

    @pytest.mark.skipif(ref is None, reason="reference not available")
    def test_parity_with_reference_chord(self):
        from pygmu2.meltysynth import (
            MidiFile as RefMidiFile,
            MidiFileSequencer as RefSequencer,
            SoundFont as RefSoundFont,
            Synthesizer as RefSynthesizer,
            SynthesizerSettings as RefSettings,
        )

        font_bytes = build_sf2(
            [
                {
                    "data": make_looped_sample(261.63, harmonics=3),
                    "rate": 44100,
                    "root_key": 60,
                    "loop": True,
                    "attack_tc": -9000,
                    "release_tc": -6000,
                }
            ]
        )
        midi_bytes = build_midi(self._chord_events())
        n = int(1.5 * SR)

        ours_synth = Synthesizer(
            SoundFont(font_bytes), SynthesizerSettings(block_size=64)
        )
        seq = MidiFileSequencer(ours_synth)
        seq.play(MidiFile(midi_bytes))
        ours = np.zeros((n, 2), np.float32)
        seq.render(ours[:, 0], ours[:, 1])

        rs = RefSettings(SR)
        rs.block_size = 64
        ref_synth = RefSynthesizer(RefSoundFont(io.BytesIO(font_bytes)), rs)
        rseq = RefSequencer(ref_synth)
        rseq.play(RefMidiFile(io.BytesIO(midi_bytes)), False)
        theirs = np.zeros((n, 2), np.float64)
        l = np.zeros(n, np.float64)
        r = np.zeros(n, np.float64)
        rseq.render(l, r)
        theirs[:, 0] = l
        theirs[:, 1] = r

        np.testing.assert_allclose(ours, theirs, atol=1e-4)
