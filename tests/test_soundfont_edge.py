"""Synth edge behaviors: hold pedal, voice stealing, exclusive class,
percussion bank. Each compared offline vs scanned (the two engines are
independent implementations of the same voice semantics).
(reference: synth/synthesizer.py note_on/note_off, channel hold_pedal;
synth/voice_collection.py stealing; region exclusive_class)"""

import numpy as np

from pygmu2_tpu.soundfont import (
    MidiFile,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from pygmu2_tpu.soundfont.offline import render_midi_offline
from tests.test_soundfont import build_midi

SR = 44100


def _both(font_bytes, events, seconds, block=64, poly=8, atol=2e-5):
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
    return scanned


def _font(**kw):
    spec = {"data": make_looped_sample(261.63, harmonics=3), "rate": 44100,
            "root_key": 60, "loop": True, "release_tc": -3000}
    spec.update(kw)
    return build_sf2([spec])


def test_hold_pedal_sustains_past_note_off():
    font = _font()
    events = [
        (0.0, 0xB0, 64, 127),   # sustain pedal down
        (0.05, 0x90, 60, 100),
        (0.2, 0x80, 60, 0),     # note off while held -> keeps sounding
        (0.6, 0xB0, 64, 0),     # pedal up -> release begins
    ]
    out = _both(font, events, 1.0)
    # audible well after the note-off because the pedal held it
    seg = out[int(0.4 * SR): int(0.5 * SR)]
    assert np.abs(seg).max() > 1e-3
    # decayed after pedal release + release time
    tail = out[int(0.95 * SR):]
    assert np.abs(tail).max() < np.abs(seg).max()


def test_voice_stealing_over_polyphony():
    font = _font()
    # 12 notes into 8 voices: 4 get stolen; engines must agree exactly
    events = [(0.01 * k, 0x90, 48 + k, 100) for k in range(12)]
    out = _both(font, events, 0.5, poly=8)
    assert np.abs(out).max() > 1e-3


def test_exclusive_class_chokes_previous_note():
    font = _font(exclusive_class=1)
    events = [
        (0.0, 0x90, 60, 100),
        (0.25, 0x90, 67, 100),  # same exclusive class -> chokes key 60
    ]
    out = _both(font, events, 0.6)
    assert np.abs(out).max() > 1e-3


def test_percussion_channel_uses_bank_128():
    font = build_sf2([
        {"data": make_looped_sample(200.0, harmonics=2), "rate": 44100,
         "root_key": 60, "loop": True, "bank": 128, "patch": 0},
    ])
    # channel 9 is percussion: its default bank is 128
    events = [(0.0, 0x99, 60, 100)]
    out = _both(font, events, 0.3)
    assert np.abs(out).max() > 1e-3


# ---- reference-parity edge matrix (VERDICT r3 item 8) ---------------------
#
# Every feature below renders the SAME font+score through our engine and
# the imported reference meltysynth (sequencer path, block 64) and must
# agree at <= 1e-4 — the chain that test_soundfont.py pins for the plain
# chord, extended to the stateful edge behaviors.
# (reference: synth/voice.py:120-215 release/exclusive handling,
# synth/channel.py RPN data entry, synth/oscillator.py LoopMode 3)

from tests.ref_oracle import load_reference

ref = load_reference()


def _parity_case(case):
    base = {
        "data": make_looped_sample(261.63, harmonics=3),
        "rate": SR,
        "root_key": 60,
        "loop": True,
        "attack_tc": -9000,
        "release_tc": -5000,
    }
    if case == "exclusive_class_cut":
        font = build_sf2([dict(base, exclusive_class=3)])
        events = [
            (0.0, 0x90, 60, 100),
            (0.3, 0x90, 67, 100),  # same class: chokes the first voice
            (0.8, 0x80, 67, 0),
        ]
        return font, events, 1.2
    if case == "loop_until_note_off":
        font = build_sf2([dict(base, loop_mode=3)])
        events = [
            (0.0, 0x90, 60, 100),
            (0.0, 0x90, 72, 90),
            (0.25, 0x80, 60, 0),  # post-loop playback + release
            (0.6, 0x80, 72, 0),
        ]
        return font, events, 1.2
    if case == "sustain_pedal_hold":
        font = build_sf2([base])
        events = [
            (0.0, 0xB0, 64, 127),  # pedal down
            (0.05, 0x90, 60, 100),
            (0.2, 0x80, 60, 0),    # held by pedal
            (0.6, 0xB0, 64, 0),    # pedal up -> release
        ]
        return font, events, 1.2
    if case == "rpn_bend_range_mid_note":
        font = build_sf2([base])
        events = [
            (0.0, 0x90, 60, 100),
            (0.1, 0xE0, 0x00, 0x70),  # bend up, default 2-semitone range
            (0.3, 0xB0, 101, 0),      # RPN MSB 0
            (0.3, 0xB0, 100, 0),      # RPN LSB 0 -> pitch bend range
            (0.3, 0xB0, 6, 12),       # data entry: 12 semitones
            (0.5, 0xE0, 0x00, 0x70),  # same wheel, 6x the pitch swing
            (0.9, 0x80, 60, 0),
        ]
        return font, events, 1.2
    if case == "stereo_linked_pair":
        left = dict(
            base,
            data=make_looped_sample(261.63, harmonics=3),
            pan=-50,
            sample_type=4,
            sample_link=1,
        )
        right = dict(
            base,
            data=make_looped_sample(329.63, harmonics=2),
            pan=50,
            sample_type=2,
            sample_link=0,
        )
        # one instrument, two full-range zones: each note-on spawns the
        # linked pair, hard-panned (how SF2 authors stereo samples)
        font = build_sf2([left, right], multizone=True)
        events = [(0.0, 0x90, 60, 100), (0.5, 0x80, 60, 0)]
        return font, events, 1.0
    raise AssertionError(case)


import pytest


@pytest.mark.skipif(ref is None, reason="reference not available")
@pytest.mark.parametrize(
    "case",
    [
        "exclusive_class_cut",
        "loop_until_note_off",
        "sustain_pedal_hold",
        "rpn_bend_range_mid_note",
        "stereo_linked_pair",
    ],
)
def test_reference_parity_edge(case):
    import io

    from pygmu2.meltysynth import (
        MidiFile as RefMidiFile,
        MidiFileSequencer as RefSequencer,
        SoundFont as RefSoundFont,
        Synthesizer as RefSynthesizer,
        SynthesizerSettings as RefSettings,
    )

    from pygmu2_tpu.soundfont import MidiFileSequencer

    font_bytes, events, seconds = _parity_case(case)
    midi_bytes = build_midi(events)
    n = int(seconds * SR)

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
    lch = np.zeros(n, np.float64)
    rch = np.zeros(n, np.float64)
    rseq.render(lch, rch)
    theirs = np.stack([lch, rch], axis=1)

    assert np.abs(theirs).max() > 1e-3, f"{case}: reference rendered silence"
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_fused_path_block_640_resident_kernel():
    """Block sizes that pass the N % 128 == 0 fused gate but do not
    divide 512 (e.g. 640) must pick a valid chunk via gcd, not trip the
    kernel's divisibility assert (advisor round-2 finding:
    filter_pallas.py osc_filter_gain_mix_pallas chunk clamp)."""
    from pygmu2_tpu.soundfont import offline as off

    font = _font()
    events = [(0.0, 0x90, 60, 100), (0.1, 0x90, 64, 90)]
    midi = MidiFile(build_midi(events))
    s1 = Synthesizer(
        SoundFont(font), SynthesizerSettings(block_size=640)
    )
    off.FORCE_PALLAS_INTERPRET = True
    try:
        fused = render_midi_offline(s1, midi, 0.5)
    finally:
        off.FORCE_PALLAS_INTERPRET = False
    s2 = Synthesizer(
        SoundFont(font), SynthesizerSettings(block_size=640)
    )
    scanned = s2.render_midi_schedule(midi, 0.5)
    assert np.abs(scanned).max() > 1e-3
    np.testing.assert_allclose(fused, scanned, atol=2e-5)


def test_fused_path_block_640_window_kernel():
    """Same odd-block gate through the windowed-DMA (large-font) kernel."""
    from pygmu2_tpu.soundfont import offline as off
    from tests.test_soundfont_large_font import large_font_bytes, demo_events

    font = large_font_bytes()
    midi = MidiFile(build_midi(demo_events()))
    s1 = Synthesizer(
        SoundFont(font),
        SynthesizerSettings(block_size=640, maximum_polyphony=128),
    )
    off.FORCE_PALLAS_INTERPRET = True
    try:
        windowed = render_midi_offline(s1, midi, 0.5)
    finally:
        off.FORCE_PALLAS_INTERPRET = False
    s2 = Synthesizer(
        SoundFont(font),
        SynthesizerSettings(block_size=640, maximum_polyphony=128),
    )
    hostctl = off.render_midi_offline_hostctl(s2, midi, 0.5)
    assert np.abs(hostctl).max() > 1e-3
    np.testing.assert_allclose(windowed, hostctl, atol=2e-5)
