"""Offline (fully-parallel) renderer vs the scanned block renderer."""

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MidiFile,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from pygmu2_tpu.soundfont.offline import render_midi_offline
from tests.test_soundfont import build_midi

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)

SR = 44100


def _compare(font_bytes, events, seconds, block=64, poly=32, atol=2e-5):
    midi = MidiFile(build_midi(events))
    s1 = Synthesizer(
        SoundFont(font_bytes),
        SynthesizerSettings(block_size=block, maximum_polyphony=poly),
    )
    scanned = s1.render_midi_schedule(midi, seconds)
    s2 = Synthesizer(
        SoundFont(font_bytes),
        SynthesizerSettings(block_size=block, maximum_polyphony=poly),
    )
    offline = render_midi_offline(s2, midi, seconds)
    np.testing.assert_allclose(offline, scanned, atol=atol)
    assert np.abs(scanned).max() > 1e-4  # non-degenerate workload


class TestOfflineParity:
    def test_chord_with_noteoffs(self):
        font = build_sf2(
            [{"data": make_looped_sample(261.63, harmonics=4), "rate": 44100,
              "root_key": 60, "loop": True, "attack_tc": -9000, "release_tc": -5000}]
        )
        events = [
            (0.0, 0x90, 60, 100), (0.0, 0x90, 64, 90), (0.1, 0x90, 67, 80),
            (0.6, 0x80, 60, 0), (0.8, 0x80, 64, 0), (1.0, 0x80, 67, 0),
        ]
        _compare(font, events, 1.5)

    def test_pitch_bend_and_controllers(self):
        font = build_sf2(
            [{"data": make_looped_sample(220.0, harmonics=3), "rate": 44100,
              "root_key": 57, "loop": True}]
        )
        events = [
            (0.0, 0x90, 57, 100),
            (0.2, 0xE0, 0, 96),    # bend up
            (0.4, 0xB0, 7, 70),    # volume down
            (0.6, 0xE0, 0, 64),    # bend center
            (0.9, 0x80, 57, 0),
        ]
        _compare(font, events, 1.2)

    def test_no_loop_sample_ends(self):
        # Short one-shot: voice dies when the oscillator runs off the end.
        font = build_sf2(
            [{"data": make_looped_sample(261.63, cycles=4), "rate": 44100,
              "root_key": 60, "loop": False}]
        )
        events = [(0.0, 0x90, 60, 100), (0.0, 0x90, 72, 100)]
        _compare(font, events, 0.5)

    def test_loop_until_note_off(self):
        data = make_looped_sample(261.63, cycles=8)
        n = len(data)
        import struct

        from pygmu2_tpu.soundfont.build import build_sf2 as b

        font = b([
            {"data": data, "rate": 44100, "root_key": 60, "loop": True,
             "release_tc": -3000}
        ])

        # patch loop mode to LOOP_UNTIL_NOTE_OFF (=3) in the igen record:
        font = font.replace(
            struct.pack("<Hh", 54, 1), struct.pack("<Hh", 54, 3)
        )
        events = [(0.0, 0x90, 60, 100), (0.3, 0x80, 60, 0)]
        _compare(font, events, 1.0)

    def test_retrigger_same_slot(self):
        # Rapid retriggers force epoch churn in one slot (poly=8).
        font = build_sf2(
            [{"data": make_looped_sample(261.63), "rate": 44100,
              "root_key": 60, "loop": True, "release_tc": -7000}]
        )
        events = []
        for i in range(12):
            t = i * 0.08
            events.append((t, 0x90, 60 + (i % 3), 100))
            events.append((t + 0.05, 0x80, 60 + (i % 3), 0))
        _compare(font, events, 1.2, poly=8)


def test_device_control_matches_host_control():
    """The jnp control pass must match the numpy control pass."""
    from pygmu2_tpu.soundfont.offline import render_midi_offline_hostctl

    font = build_sf2(
        [{"data": make_looped_sample(261.63, harmonics=4), "rate": 44100,
          "root_key": 60, "loop": True, "attack_tc": -9000, "release_tc": -5000}]
    )
    events = [(0.0, 0x90, 60, 100), (0.15, 0x90, 64, 90), (0.4, 0x80, 60, 0)]
    midi = MidiFile(build_midi(events))
    mk = lambda: Synthesizer(
        SoundFont(font), SynthesizerSettings(block_size=64, maximum_polyphony=8)
    )
    a = render_midi_offline_hostctl(mk(), midi, 0.7)
    b = render_midi_offline(mk(), midi, 0.7)
    np.testing.assert_allclose(a, b, atol=1e-5)


class TestScheduleFuzz:
    """Randomized MIDI scores through both renderers — adversarial
    coverage for the event-driven build_schedule (events on block
    boundaries, beyond the render end, dense retriggers, empty)."""

    def _font(self):
        return build_sf2(
            [{"data": make_looped_sample(261.63, harmonics=3), "rate": SR,
              "root_key": 60, "loop": True, "release_tc": -5000}]
        )

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_scores(self, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        block = 64  # one shape -> one compile reused across seeds
        seconds = 0.6
        events = []
        t = 0.0
        for _ in range(rng.integers(3, 25)):
            t += float(rng.uniform(0, 0.08))
            kind = rng.integers(0, 5)
            ch = int(rng.integers(0, 3))
            key = int(rng.integers(40, 90))
            if kind <= 1:
                events.append((t, 0x90 | ch, key, int(rng.integers(20, 127))))
            elif kind == 2:
                events.append((t, 0x80 | ch, key, 0))
            elif kind == 3:  # pitch bend
                events.append((t, 0xE0 | ch, int(rng.integers(0, 128)),
                               int(rng.integers(0, 128))))
            else:  # volume
                events.append((t, 0xB0 | ch, 7, int(rng.integers(30, 127))))
        # events exactly on a block boundary + beyond the render end
        events.append((block / SR * 2, 0x90, 60, 100))
        events.append((seconds + 0.2, 0x90, 72, 100))
        events.sort(key=lambda e: e[0])
        _compare(self._font(), events, seconds, block=block, poly=16,
                 atol=5e-5)

    def test_empty_midi(self):
        midi = MidiFile(build_midi([]))
        s = Synthesizer(
            SoundFont(self._font()),
            SynthesizerSettings(block_size=64, maximum_polyphony=8),
        )
        out = render_midi_offline(s, midi, 0.1)
        assert out.shape[0] == int(0.1 * SR) and np.abs(out).max() == 0.0

    def test_note_never_released(self):
        events = [(0.0, 0x90, 60, 100)]
        _compare(self._font(), events, 0.6, block=64, poly=16)
