"""MidiFile / MidiFileSequencer behavior breadth.

Mirrors the reference's MIDI-layer behaviors (reference:
src/pygmu2/meltysynth/midi/ + sequencer tests embedded in
tests/test_meltysynth.py) beyond test_microedge_soundfont.py's parser
error paths: file surface (track_count/resolution/length/messages),
from_file, sequencer play/loop/stop semantics, and render windows.
"""

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
from tests.sf2_builder import build_sf2, make_looped_sample
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


def make_midi(events, resolution=480, bpm=120):
    """Build a single-track SMF from (seconds, status, d1, d2) tuples."""

    def varint(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append(0x80 | (v & 0x7F))
            v >>= 7
        return bytes(reversed(out))

    tick_per_sec = resolution * bpm / 60.0
    body = b""
    last = 0
    for t, status, d1, d2 in events:
        tick = int(round(t * tick_per_sec))
        body += varint(tick - last) + bytes([status, d1, d2])
        last = tick
    body += varint(0) + b"\xff\x2f\x00"
    return (
        b"MThd" + struct.pack(">ihhh", 6, 0, 1, resolution)
        + b"MTrk" + struct.pack(">i", len(body)) + body
    )


@pytest.fixture
def midi_simple():
    return MidiFile(make_midi([
        (0.0, 0x90, 60, 100),
        (0.5, 0x80, 60, 0),
        (0.5, 0x90, 64, 100),
        (1.0, 0x80, 64, 0),
    ]))


def make_synth(block=64, poly=8):
    font = SoundFont(build_sf2([
        {"data": make_looped_sample(261.63), "rate": 44100,
         "root_key": 60, "loop": True}
    ]))
    return Synthesizer(font, SynthesizerSettings(
        sample_rate=44100, block_size=block, maximum_polyphony=poly))


class TestMidiFileSurface:
    def test_track_count(self, midi_simple):
        assert midi_simple.track_count == 1

    def test_resolution(self, midi_simple):
        assert midi_simple.resolution == 480

    def test_length_matches_last_event(self, midi_simple):
        assert midi_simple.length == pytest.approx(1.0, abs=0.01)

    def test_messages_sorted_by_time(self, midi_simple):
        times = list(midi_simple.times)
        assert times == sorted(times)

    def test_message_count(self, midi_simple):
        assert len(list(midi_simple.messages)) >= 4

    def test_from_file(self, tmp_path, midi_simple):
        p = tmp_path / "t.mid"
        p.write_bytes(make_midi([(0.0, 0x90, 60, 100), (1.0, 0x80, 60, 0)]))
        mf = MidiFile.from_file(str(p))
        assert mf.track_count == 1
        assert mf.length == pytest.approx(1.0, abs=0.01)

    def test_repr(self, midi_simple):
        r = repr(midi_simple)
        assert "MidiFile" in r

    def test_empty_score_zero_length(self):
        mf = MidiFile(make_midi([]))
        assert mf.length == pytest.approx(0.0, abs=1e-6)

    def test_multi_track_merged(self):
        # format-1 file with two tracks: events interleave by time
        def track(events, resolution=480, bpm=120):
            def varint(v):
                out = [v & 0x7F]
                v >>= 7
                while v:
                    out.append(0x80 | (v & 0x7F))
                    v >>= 7
                return bytes(reversed(out))

            tick_per_sec = resolution * bpm / 60.0
            body = b""
            last = 0
            for t, status, d1, d2 in events:
                tick = int(round(t * tick_per_sec))
                body += varint(tick - last) + bytes([status, d1, d2])
                last = tick
            body += varint(0) + b"\xff\x2f\x00"
            return b"MTrk" + struct.pack(">i", len(body)) + body

        data = (
            b"MThd" + struct.pack(">ihhh", 6, 1, 2, 480)
            + track([(0.0, 0x90, 60, 100), (1.0, 0x80, 60, 0)])
            + track([(0.5, 0x91, 64, 100), (1.5, 0x81, 64, 0)])
        )
        mf = MidiFile(data)
        assert mf.track_count == 2
        times = list(mf.times)
        assert times == sorted(times)
        assert mf.length == pytest.approx(1.5, abs=0.01)


class TestMidiFileSequencer:
    def test_play_produces_audio(self, midi_simple):
        seq = MidiFileSequencer(make_synth())
        seq.play(midi_simple)
        out = seq.render_to_array(0.6)
        assert np.abs(out).max() > 0.001

    def test_silence_before_play(self):
        seq = MidiFileSequencer(make_synth())
        left = np.zeros(256, np.float32)
        right = np.zeros(256, np.float32)
        seq.render(left, right)
        np.testing.assert_array_equal(left, 0.0)

    def test_stop_silences_future_events(self, midi_simple):
        seq = MidiFileSequencer(make_synth())
        seq.play(midi_simple)
        out1 = seq.render_to_array(0.25)
        assert np.abs(out1).max() > 0.001
        seq.stop()
        out2 = seq.render_to_array(0.5)
        # stop kills voices and cancels the score: output decays to nil
        assert np.abs(out2[-100:]).max() < 1e-3

    def test_render_offset_count_window(self, midi_simple):
        seq = MidiFileSequencer(make_synth())
        seq.play(midi_simple)
        left = np.full(512, -9.0, np.float32)
        right = np.full(512, -9.0, np.float32)
        seq.render(left, right, offset=128, count=256)
        np.testing.assert_array_equal(left[:128], -9.0)
        np.testing.assert_array_equal(left[384:], -9.0)
        assert np.any(left[128:384] != -9.0)

    def test_loop_restarts_score(self):
        short = MidiFile(make_midi([
            (0.0, 0x90, 60, 100), (0.05, 0x80, 60, 0),
        ]))
        seq = MidiFileSequencer(make_synth())
        seq.play(short, loop=True)
        sr = 44100
        out = seq.render_to_array(0.5)
        # looped 0.05 s note keeps retriggering: energy well past one pass
        late = out[int(0.3 * sr) :]
        assert np.abs(late).max() > 0.001

    def test_no_loop_score_ends(self):
        short = MidiFile(make_midi([
            (0.0, 0x90, 60, 100), (0.05, 0x80, 60, 0),
        ]))
        seq = MidiFileSequencer(make_synth())
        seq.play(short, loop=False)
        out = seq.render_to_array(1.0)
        tail = out[-4410:]
        assert np.abs(tail).max() < 0.01  # released and decayed

    def test_sequencer_matches_offline_path(self, midi_simple):
        from pygmu2_tpu.soundfont.offline import render_midi_offline

        seq = MidiFileSequencer(make_synth())
        seq.play(midi_simple)
        streamed = seq.render_to_array(1.0)
        offline = render_midi_offline(make_synth(), midi_simple, 1.0)
        np.testing.assert_allclose(streamed, offline, atol=1e-4)
