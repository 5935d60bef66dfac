"""Property fuzz: windowed-DMA oscillator vs the XLA fallback across
RANDOM fonts and schedules (interpret mode on CPU).

The directed tests in test_soundfont_large_font.py pin specific
behaviors (anchoring, refresh-plan edges, segment threading); this file
sweeps the space: random multi-sample fonts straddling loop/no-loop and
anchorable/unanchorable loop sizes, random note on/off schedules with
bends and mod-wheel moves. Every case must agree with the XLA
one-hot/row-gather path — the slow oracle that is correct at any ratio
— to 2e-5.

Reference anchor: reference meltysynth/synth/oscillator.py:79-148
(arbitrary-length sample playback).
"""

import numpy as np
import pytest

from pygmu2_tpu.soundfont import MidiFile, SoundFont, Synthesizer, SynthesizerSettings
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from pygmu2_tpu.soundfont import offline as off
from pygmu2_tpu.soundfont import filter_pallas as fp
from tests.test_soundfont import build_midi
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100
SECONDS = 0.2


def random_font(rng) -> bytes:
    """2-4 samples; total wave past OSC_KERNEL_MAX_WAVE so the windowed
    path engages; mix of small (anchorable) and large loops and
    non-looping sweeps."""
    n = int(rng.integers(2, 5))
    samples = []
    for i in range(n):
        freq = float(rng.uniform(80.0, 900.0))
        kind = int(rng.integers(0, 3))
        if kind == 0:  # small anchorable loop
            cycles = int(rng.integers(2, 8))
        elif kind == 1:  # large loop (reads unwrapped view)
            cycles = int(rng.integers(40, 120))
        else:  # non-looping sweep
            cycles = int(rng.integers(30, 100))
        samples.append({
            "data": make_looped_sample(
                freq, harmonics=int(rng.integers(1, 6)), cycles=cycles
            ),
            "rate": SR,
            "root_key": int(rng.integers(36, 96)),
            "loop": kind != 2,
            "attack_tc": int(rng.integers(-12000, -6000)),
            "release_tc": int(rng.integers(-8000, -2000)),
        })
    # guarantee the font exceeds the resident-kernel wavetable budget
    # (high-frequency short samples can come out tiny)
    total = sum(len(s["data"]) for s in samples)
    while total <= fp.OSC_KERNEL_MAX_WAVE + 2048:
        freq = float(rng.uniform(60.0, 200.0))
        filler = {
            "data": make_looped_sample(
                freq, harmonics=3,
                cycles=int(np.ceil(6000 * freq / SR)) + 2,
            ),
            "rate": SR,
            "root_key": int(rng.integers(36, 96)),
            "loop": bool(rng.integers(0, 2)),
        }
        samples.append(filler)
        total += len(filler["data"])
    fb = build_sf2(samples)
    return fb


def random_events(rng, n_presets):
    events = []
    for ch in range(4):
        events.append((0.0, 0xC0 | ch, int(rng.integers(0, n_presets)), 0))
    t = 0.0
    for _ in range(int(rng.integers(4, 12))):
        t += float(rng.uniform(0.0, 0.04))
        ch = int(rng.integers(0, 4))
        kind = int(rng.integers(0, 10))
        if kind < 6:
            key = int(rng.integers(40, 90))
            if rng.random() < 0.75:
                events.append((t, 0x90 | ch, key, int(rng.integers(30, 127))))
                if rng.random() < 0.5:
                    toff = t + float(rng.uniform(0.02, 0.12))
                    events.append((toff, 0x80 | ch, key, 0))
            else:
                events.append((t, 0x80 | ch, key, 0))
        elif kind < 8:  # moderate pitch bend (keeps ratio in provision)
            bend = 8192 + int(rng.integers(-2500, 2500))
            events.append((t, 0xE0 | ch, bend & 0x7F, (bend >> 7) & 0x7F))
        else:  # mod wheel
            events.append((t, 0xB0 | ch, 0x01, int(rng.integers(0, 90))))
    events.sort(key=lambda e: e[0])
    return events


def _render(font_bytes, events, window: bool):
    s = Synthesizer(
        SoundFont(font_bytes),
        SynthesizerSettings(block_size=128, maximum_polyphony=128),
    )
    off.FORCE_PALLAS_INTERPRET = window
    try:
        return off.render_midi_offline_hostctl(
            s, MidiFile(build_midi(events)), SECONDS
        )
    finally:
        off.FORCE_PALLAS_INTERPRET = False


@pytest.mark.parametrize("seed", range(6))
def test_window_vs_xla_random_schedule(seed):
    rng = np.random.default_rng(1000 + seed)
    fb = random_font(rng)
    font = SoundFont(fb)
    assert len(font.wave_data) > fp.OSC_KERNEL_MAX_WAVE, (
        "generated font too small to engage the windowed path"
    )
    events = random_events(rng, n_presets=len(font.presets))

    # the windowed path must actually engage for this schedule (else
    # both renders take the XLA path and the case tests nothing)
    s = Synthesizer(
        SoundFont(fb),
        SynthesizerSettings(block_size=128, maximum_polyphony=128),
    )
    par, ch, snap, _ = s.build_schedule(MidiFile(build_midi(events)), SECONDS)
    off.FORCE_PALLAS_INTERPRET = True
    try:
        wave_ext, win_w = off._window_args(s, par, ch)
    finally:
        off.FORCE_PALLAS_INTERPRET = False
    assert wave_ext is not None, (
        f"seed {seed}: schedule fell out of window provisioning "
        f"(ratio bound {off._ratio_bound(s, par, ch):.2f})"
    )

    ref = _render(fb, events, window=False)
    got = _render(fb, events, window=True)
    if np.abs(ref).max() < 1e-6:
        pytest.skip("silent schedule (all note-ons missed/ignored)")
    np.testing.assert_allclose(got, ref, atol=2e-5)
