"""Large-wavetable (> OSC_KERNEL_MAX_WAVE samples) oscillator paths.

Round-2 verdict: every realistic multi-megabyte SF2 falls past the
resident fused kernel's wavetable budget, and no test crossed that
boundary. These do, in both directions:

- the XLA fallback (one-hot/row-gather oscillator) against the scanned
  streaming renderer on a > 16k-sample font;
- the windowed-DMA fused kernel (``osc_window_filter_gain_mix_pallas``,
  interpret mode on CPU) against the XLA path, through BOTH offline
  entry points (host control and fused device control);
- segment state threading across WINDOW_KERNEL_MAX_T;
- the ``_window_args`` gate (font size, pitch-ratio provisioning);
- ``Synthesizer.wave_ext`` loop-view layout invariants.

Reference anchor: reference meltysynth/synth/oscillator.py:79-148 plays
samples of any length; the windowed-DMA kernel is the TPU equivalent
(HBM-resident wavetable, per-voice VMEM windows).
"""

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MidiFile,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from pygmu2_tpu.soundfont import offline as off
from pygmu2_tpu.soundfont import filter_pallas as fp
from tests.test_soundfont import build_midi
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


def large_font_bytes() -> bytes:
    """Four presets, wave_data ~43k samples (> OSC_KERNEL_MAX_WAVE):
    a small ANCHORED loop (fits one DMA window), two long loops (read
    unwrapped through their loop views), one non-looping sweep."""
    return build_sf2(
        [
            # small loop (420 samples): ANCHORED even at the minimum
            # window bucket (W = 512 at block 128)
            {"data": make_looped_sample(523.25, harmonics=3, cycles=5),
             "rate": SR, "root_key": 72, "loop": True},
            {"data": make_looped_sample(110.0, harmonics=6, cycles=40),
             "rate": SR, "root_key": 45, "loop": True},
            {"data": make_looped_sample(261.63, harmonics=4, cycles=80),
             "rate": SR, "root_key": 60, "loop": True,
             "attack_tc": -9000, "release_tc": -6000},
            {"data": make_looped_sample(523.25, harmonics=3, cycles=160),
             "rate": SR, "root_key": 72, "loop": False},
        ]
    )


def demo_events():
    return [
        (0.0, 0xC0, 0, 0), (0.0, 0xC1, 1, 0),
        (0.0, 0xC2, 2, 0), (0.0, 0xC3, 3, 0),
        (0.0, 0x90, 72, 100),          # anchored small loop
        (0.0, 0x91, 45, 90),           # long loop, unwrapped view
        (0.02, 0x92, 60, 80),          # long loop + envelopes
        (0.05, 0x93, 74, 70),          # non-looping sweep
        (0.12, 0x80, 72, 0), (0.15, 0x81, 45, 0),
    ]


SECONDS = 0.25


@pytest.fixture(scope="module")
def font():
    fb = large_font_bytes()
    assert len(SoundFont(fb).wave_data) > fp.OSC_KERNEL_MAX_WAVE
    return fb


def _synth(font_bytes, block=128, poly=128):
    return Synthesizer(
        SoundFont(font_bytes),
        SynthesizerSettings(block_size=block, maximum_polyphony=poly),
    )


def _render_hostctl(font_bytes, window: bool, block=128, seconds=SECONDS,
                    events=None):
    s = _synth(font_bytes, block=block)
    off.FORCE_PALLAS_INTERPRET = window
    try:
        return off.render_midi_offline_hostctl(
            s, MidiFile(build_midi(events or demo_events())), seconds
        )
    finally:
        off.FORCE_PALLAS_INTERPRET = False


class TestXlaFallback:
    def test_parity_vs_scanned_renderer(self, font):
        """The path every realistic .sf2 takes off-kernel, against the
        block-scanned streaming renderer (reference-shaped oracle)."""
        midi = MidiFile(build_midi(demo_events()))
        s1 = _synth(font, block=64, poly=32)
        scanned = s1.render_midi_schedule(midi, SECONDS)
        s2 = _synth(font, block=64, poly=32)
        offline = off.render_midi_offline(s2, midi, SECONDS)
        assert np.abs(scanned).max() > 1e-4
        np.testing.assert_allclose(offline, scanned, atol=2e-5)

    def test_fused_device_control_parity(self, font):
        midi = MidiFile(build_midi(demo_events()))
        s1 = _synth(font)
        a = off.render_midi_offline_hostctl(s1, midi, SECONDS)
        s2 = _synth(font)
        b = off.render_midi_offline(s2, midi, SECONDS)
        assert np.abs(a).max() > 1e-4
        np.testing.assert_allclose(a, b, atol=2e-5)


class TestWindowKernel:
    """Interpret-mode runs of the windowed-DMA kernel on CPU."""

    def test_hostctl_parity(self, font):
        ref = _render_hostctl(font, window=False)
        got = _render_hostctl(font, window=True)
        assert np.abs(ref).max() > 1e-3
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_fused_parity(self, font):
        ref = _render_hostctl(font, window=False)
        s = _synth(font)
        off.FORCE_PALLAS_INTERPRET = True
        try:
            got = off.render_midi_offline(
                s, MidiFile(build_midi(demo_events())), SECONDS
            )
        finally:
            off.FORCE_PALLAS_INTERPRET = False
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_segment_state_threading(self, font, monkeypatch):
        """Crossing WINDOW_KERNEL_MAX_T must be seamless: the filter
        carry + FIR tail thread between kernel launches."""
        one = _render_hostctl(font, window=True)
        # force 4 segments of 32 blocks (N=128)
        monkeypatch.setattr(fp, "WINDOW_KERNEL_MAX_T", 32 * 128)
        monkeypatch.setattr(off, "WINDOW_KERNEL_MAX_T", 32 * 128, raising=False)
        many = _render_hostctl(font, window=True)
        np.testing.assert_allclose(many, one, atol=1e-6)

    def test_anchored_long_sustain(self, font):
        """A sustained small-loop note far past one window length: the
        anchored view must wrap in-kernel indefinitely (no DMA refresh)."""
        events = [(0.0, 0x90, 72, 100)]
        midi = MidiFile(build_midi(events))
        s1 = _synth(font)
        ref = off.render_midi_offline_hostctl(s1, midi, 0.4)
        s2 = _synth(font)
        off.FORCE_PALLAS_INTERPRET = True
        try:
            got = off.render_midi_offline_hostctl(s2, midi, 0.4)
        finally:
            off.FORCE_PALLAS_INTERPRET = False
        assert np.abs(ref[-SR // 100 :]).max() > 1e-4  # still sounding
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_anchoring_decision(self, font):
        """The 420-sample loop anchors (static window, loopf=1); the
        long loops read unwrapped views (loopf=0, smp_end pushed out)."""
        import jax.numpy as jnp

        s = _synth(font)
        midi = MidiFile(build_midi(demo_events()))
        par, ch, snap, _ = s.build_schedule(midi, 0.1)
        ctrl = off.compute_control(s, par, ch, snap)
        off.FORCE_PALLAS_INTERPRET = True
        try:
            wave_ext, win_w = off._window_args(s, par, ch)
        finally:
            off.FORCE_PALLAS_INTERPRET = False
        ctrl_j = {k: jnp.asarray(v) for k, v in ctrl.items()}
        rows = off.window_osc_rows(ctrl_j, win_w, int(wave_ext.shape[0]))
        loopf = np.asarray(rows["loopf"])
        alive = np.asarray(ctrl["alive"])
        looping = np.asarray(ctrl["looping"])
        ll = np.asarray(ctrl["loop_len"])
        small = alive & looping & (ll + 2 <= win_w)
        big = alive & looping & (ll + 2 > win_w)
        assert small.any() and big.any()  # both classes present
        assert (loopf[small] == 1.0).all()
        assert (loopf[big] == 0.0).all()
        # anchored voices keep a CONSTANT window start for the note
        ws = np.asarray(rows["ws"])
        col = np.argwhere(small.any(axis=0)).ravel()[0]
        live_blocks = small[:, col]
        assert len(np.unique(ws[live_blocks, col])) == 1


class TestRefreshPlan:
    """Edges of the prefetched-refresh plan (host flag/nxt planes,
    double-buffered window DMA, batched semaphore wait)."""

    def test_flag_gap_late_onset(self, font):
        """Anchored-only at first — the flag plane goes quiet after
        block 0 — then a late non-looping onset forces a new flagged
        block mid-render: the prefetch issued at block 0 must target
        that block through the nxt chain, skipping the quiet gap."""
        events = [
            (0.0, 0xC0, 0, 0), (0.0, 0xC3, 3, 0),
            (0.0, 0x90, 72, 100),   # anchored small loop only
            (0.15, 0x93, 74, 70),   # late onset: window starts moving
        ]
        ref = _render_hostctl(font, window=False, events=events)
        got = _render_hostctl(font, window=True, events=events)
        late = int(0.16 * SR)
        assert np.abs(ref[late:]).max() > 1e-4  # late note audible
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_single_block_render(self, font):
        """B == 1: the prologue issues block 0's windows, the first
        flip waits them, and nxt == B suppresses any further issue."""
        one_block = 128 / SR
        ref = _render_hostctl(font, window=False, seconds=one_block)
        got = _render_hostctl(font, window=True, seconds=one_block)
        assert ref.shape == got.shape == (128, 2)
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_all_blocks_moving(self, font):
        """A single non-looping voice: every live block is flagged —
        back-to-back prefetch (issue at block b for b+1) stays exact."""
        events = [(0.0, 0xC3, 3, 0), (0.0, 0x93, 74, 70)]
        ref = _render_hostctl(font, window=False, events=events)
        got = _render_hostctl(font, window=True, events=events)
        assert np.abs(ref).max() > 1e-4
        np.testing.assert_allclose(got, ref, atol=2e-5)


class TestWindowArgsGate:
    def test_small_font_stays_resident(self):
        fb = build_sf2(
            [{"data": make_looped_sample(261.63, harmonics=4), "rate": SR,
              "root_key": 60, "loop": True}]
        )
        s = _synth(fb)
        par, ch, snap, _ = s.build_schedule(
            MidiFile(build_midi([(0.0, 0x90, 60, 100)])), 0.1
        )
        off.FORCE_PALLAS_INTERPRET = True
        try:
            ext, w = off._window_args(s, par, ch)
        finally:
            off.FORCE_PALLAS_INTERPRET = False
        assert ext is None and w is None

    def test_large_font_engages(self, font):
        s = _synth(font)
        par, ch, snap, _ = s.build_schedule(
            MidiFile(build_midi(demo_events())), 0.1
        )
        off.FORCE_PALLAS_INTERPRET = True
        try:
            ext, w = off._window_args(s, par, ch)
        finally:
            off.FORCE_PALLAS_INTERPRET = False
        assert ext is not None
        # adaptive bucket: smallest power-of-two (>= 2) covering the
        # schedule's actual pitch-ratio bound, never the worst case
        bound = off._ratio_bound(s, par, ch)
        bucket = 2
        while bucket < bound:
            bucket *= 2
        assert bucket <= off.WINDOW_RATIO_BUCKET
        assert w == off.window_w(128, bucket)
        assert int(ext.shape[0]) % 128 == 0

    def test_out_of_provision_ratio_falls_back(self, font):
        """> 3 octaves above the root key exceeds the window bucket —
        the gate must refuse (XLA fallback keeps any ratio correct)."""
        s = _synth(font)
        events = [(0.0, 0xC3, 3, 0), (0.0, 0x93, 72 + 40, 100)]
        par, ch, snap, _ = s.build_schedule(
            MidiFile(build_midi(events)), 0.1
        )
        assert off._ratio_bound(s, par, ch) > off.WINDOW_RATIO_BUCKET
        off.FORCE_PALLAS_INTERPRET = True
        try:
            ext, w = off._window_args(s, par, ch)
        finally:
            off.FORCE_PALLAS_INTERPRET = False
        assert ext is None and w is None

    def test_high_ratio_audio_correct_through_fallback(self, font):
        """The rejected schedule still renders correctly (XLA path)."""
        events = [(0.0, 0xC1, 1, 0), (0.0, 0x91, 45 + 30, 100)]
        midi = MidiFile(build_midi(events))
        s1 = _synth(font, block=64, poly=32)
        scanned = s1.render_midi_schedule(midi, 0.15)
        s2 = _synth(font, block=64, poly=32)
        offline = off.render_midi_offline(s2, midi, 0.15)
        assert np.abs(scanned).max() > 1e-4
        np.testing.assert_allclose(offline, scanned, atol=2e-5)


class TestWaveExt:
    def test_layout_invariants(self, font):
        s = _synth(font)
        # registering views happens at note_on (schedule build)
        s.build_schedule(MidiFile(build_midi(demo_events())), 0.1)
        ext = np.asarray(s.wave_ext())
        wave = np.asarray(s._sound_font.wave_data, np.float32)
        L = len(wave)
        assert len(ext) % 128 == 0
        np.testing.assert_array_equal(ext[:L], wave)
        assert len(s._lv_map) >= 2  # at least the looping presets played
        for (ls, le), lv in s._lv_map.items():
            ll = le - ls
            assert lv % 128 == 0
            view = ext[lv : lv + ll + s._lv_guard]
            expect = np.tile(wave[ls:le], -(-(ll + s._lv_guard) // ll))[
                : ll + s._lv_guard
            ]
            np.testing.assert_array_equal(view, expect)

    def test_cache_rebuilds_on_new_views(self, font):
        s = _synth(font)
        s.build_schedule(MidiFile(build_midi([(0.0, 0xC1, 1, 0),
                                              (0.0, 0x91, 45, 100)])), 0.05)
        e1 = s.wave_ext()
        n1 = int(e1.shape[0])
        s.build_schedule(MidiFile(build_midi(demo_events())), 0.05)
        e2 = s.wave_ext()
        assert int(e2.shape[0]) > n1  # new loop views appended
        # unchanged prefix: original wave + first view (everything
        # before e1's zero tail, which the new views now occupy)
        tail = -(-(s._lv_guard + 1024) // 128) * 128
        np.testing.assert_array_equal(np.asarray(e2)[: n1 - tail],
                                      np.asarray(e1)[: n1 - tail])
