"""Streamed offline render: schedule/compute overlap with carried state.

``offline.render_midi_offline_streamed`` dispatches segment k to the
device while the host event simulation produces segment k+1. Exactness
rests on two carries: the control pass's scan carries
(``_control_device`` streaming mode) and the fused kernel's (4, P)
filter state. Every case here pins the streamed render against the
monolithic ``render_midi_offline`` at <= 1e-5 (most cases come out
bit-identical; only the f64 advance cumsum may regroup across segment
boundaries), with the fused kernels in interpret mode on CPU.

Reference anchor: the reference renders MIDI block-by-block in one
sequential pass (reference: src/pygmu2/meltysynth/synth/synthesizer.py
render loop); segmentation must be unobservable in the audio.
"""

import struct

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MidiFile,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont import offline as off
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from tests.test_soundfont import build_midi

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)

SR = 44100


def _mk(font_bytes, block=128, poly=128):
    return Synthesizer(
        SoundFont(font_bytes),
        SynthesizerSettings(block_size=block, maximum_polyphony=poly),
    )


def _stream_compare(font_bytes, events, seconds, seg_blocks, tol=1e-5):
    midi = MidiFile(build_midi(events))
    off.FORCE_PALLAS_INTERPRET = True
    try:
        mono = off.render_midi_offline(_mk(font_bytes), midi, seconds)
        got = off.render_midi_offline_streamed(
            _mk(font_bytes), midi, seconds, seg_blocks=seg_blocks
        )
    finally:
        off.FORCE_PALLAS_INTERPRET = False
    assert got.shape == mono.shape
    assert np.abs(mono).max() > 1e-3, "workload produced silence"
    np.testing.assert_allclose(got, mono, atol=tol)
    return mono


BASIC_FONT = build_sf2(
    [
        {
            "data": make_looped_sample(261.63, harmonics=4),
            "rate": SR,
            "root_key": 60,
            "loop": True,
            "attack_tc": -9000,
            "release_tc": -4000,
        }
    ]
)

CHORD_EVENTS = [
    e
    for ch in range(4)
    for k in (48, 60, 64, 67)
    for e in (
        (0.01 * ch, 0x90 | ch, k, 100),
        (0.27 + 0.013 * ch, 0x80 | ch, k, 0),
    )

] + [(0.1, 0xE0, 0x00, 0x50)]


@pytest.mark.parametrize("seg_blocks", [7, 23, 64])
def test_chord_release_across_boundaries(seg_blocks):
    # notes strike in segment 1 and release in later segments; the last
    # segment is partial (prime-ish counts) so the block padding path
    # runs too
    _stream_compare(BASIC_FONT, sorted(CHORD_EVENTS), 0.55, seg_blocks)


def test_seg_size_invariance():
    midi_events = sorted(CHORD_EVENTS)
    a = _stream_compare(BASIC_FONT, midi_events, 0.55, 13)
    b = _stream_compare(BASIC_FONT, midi_events, 0.55, 40)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_retrigger_epoch_churn():
    # rapid re-strikes of the same keys force slot reuse (fresh rows)
    # right next to segment boundaries
    events = []
    for i in range(10):
        t = i * 0.05
        events.append((t, 0x90, 60 + (i % 3), 100))
        events.append((t + 0.03, 0x80, 60 + (i % 3), 0))
    _stream_compare(BASIC_FONT, events, 0.6, 9)


def test_loop_until_note_off_across_boundary():
    # mode-3 release fix: the voice releases in one segment and keeps
    # sounding (post-loop playback) into the next — exercises the
    # carried base_at_rel forward-fill
    font = BASIC_FONT.replace(
        struct.pack("<Hh", 54, 1), struct.pack("<Hh", 54, 3)
    )
    events = [
        (0.0, 0x90, 60, 100),
        (0.0, 0x90, 67, 90),
        (0.12, 0x80, 60, 0),
        (0.31, 0x80, 67, 0),
    ]
    _stream_compare(font, events, 0.6, 11)


def test_sustain_pedal_across_boundary():
    # pedal down in segment 1, note-off under pedal, pedal up segments
    # later — the release eligibility scan must carry the hold state
    events = [
        (0.0, 0xB0, 64, 127),  # sustain down
        (0.02, 0x90, 60, 100),
        (0.10, 0x80, 60, 0),  # held by pedal
        (0.40, 0xB0, 64, 0),  # pedal up: release starts here
    ]
    _stream_compare(BASIC_FONT, events, 0.7, 10)


def test_streamed_windowed_large_font():
    from pygmu2_tpu.soundfont import filter_pallas as fp
    from tests.test_soundfont_window_fuzz import random_events, random_font

    rng = np.random.default_rng(7)
    fb = random_font(rng)
    font = SoundFont(fb)
    assert len(font.wave_data) > fp.OSC_KERNEL_MAX_WAVE
    events = random_events(rng, n_presets=len(font.presets))
    _stream_compare(fb, events, 0.3, 17)


def test_single_segment_falls_back_to_monolithic():
    # piece fits one segment: the streamed entry point must defer to the
    # monolithic renderer (and still be correct)
    _stream_compare(BASIC_FONT, sorted(CHORD_EVENTS), 0.3, 4096)


def test_schedule_segments_match_monolithic_exactly():
    """Host-level: expanding the per-segment snapshot stacks block by
    block reproduces the monolithic schedule bit-for-bit (same event
    batching, same voice-allocation decisions)."""
    midi = MidiFile(build_midi(sorted(CHORD_EVENTS)))
    seconds = 0.55

    synth = _mk(BASIC_FONT)
    par_m, ch_m, sidx_m, n_blocks = synth.build_schedule(midi, seconds)

    synth2 = _mk(BASIC_FONT)
    b = 0
    for par_s, ch_s, sidx_s, nb in synth2.build_schedule_segments(
        midi, seconds, 23
    ):
        for j in range(nb):
            gm = sidx_m[b + j]
            gs = sidx_s[j]
            for k in par_m:
                np.testing.assert_array_equal(
                    par_s[k][gs], par_m[k][gm], err_msg=f"par[{k}] block {b + j}"
                )
            for k in ch_m:
                np.testing.assert_array_equal(
                    ch_s[k][gs], ch_m[k][gm], err_msg=f"ch[{k}] block {b + j}"
                )
        b += nb
    assert b == n_blocks
