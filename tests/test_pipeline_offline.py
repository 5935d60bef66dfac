"""Pipelined offline render (download/compute overlap) parity.

`render_midi_offline(pipeline=K)` splits the fused render into K
host-level dispatches with the kernels' (4, P) carry threaded between
them, starting each segment's D2H transfer as soon as it is dispatched.
The math is the same kernels over the same blocks, so output must match
the monolithic single-dispatch path to float32 round-off — on both the
resident fused kernel (small fonts) and the windowed-DMA kernel (large
fonts), for both wire formats, including ragged segment splits.

Reference anchor: the reference benchmark render is a single in-process
numpy pass (reference: benchmarks/benchmark_meltysynth.py); link
pipelining has no reference counterpart, so the oracle here is the
repo's own monolithic path (itself reference-parity-gated in
tests/test_soundfont.py and tests/test_bench_parity.py).
"""

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MidiFile,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont import filter_pallas as fp
from pygmu2_tpu.soundfont import offline as off
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from tests.test_soundfont import build_midi
from tests.test_soundfont_large_font import demo_events, large_font_bytes

SR = 44100
SECONDS = 0.25


@pytest.fixture(scope="module")
def small_font():
    return build_sf2(
        [
            {
                "data": make_looped_sample(261.63, harmonics=4),
                "rate": SR,
                "root_key": 60,
                "loop": True,
                "attack_tc": -9000,
                "release_tc": -5000,
            }
        ]
    )


@pytest.fixture(scope="module")
def big_font():
    return large_font_bytes()


def _synth(font_bytes, block=128, poly=128):
    return Synthesizer(
        SoundFont(font_bytes),
        SynthesizerSettings(block_size=block, maximum_polyphony=poly),
    )


SMALL_EVENTS = [
    (0.0, 0x90, 60, 100),
    (0.0, 0x91, 64, 90),
    (0.02, 0x92, 67, 80),
    (0.12, 0x80, 60, 0),
    (0.15, 0x81, 64, 0),
]


def _render(font_bytes, *, pipeline, wire="f32", seconds=SECONDS,
            events=None):
    s = _synth(font_bytes)
    midi = MidiFile(build_midi(events or SMALL_EVENTS))
    off.FORCE_PALLAS_INTERPRET = True
    try:
        return off.render_midi_offline(
            s, midi, seconds, wire=wire, pipeline=pipeline
        )
    finally:
        off.FORCE_PALLAS_INTERPRET = False


def _clear_offline_jit_caches():
    """The fused-render jits close over the kernel MAX_T constants at
    trace time; tests that shrink them must drop compiled programs."""
    off._render_fused_flat_jit.clear_cache()
    off._render_rows_seg_jit.clear_cache()
    off._prep_rows_flat_jit.clear_cache()


class TestResidentKernelPipeline:
    """Small font: the resident fused kernel, interpret mode on CPU."""

    def test_f32_parity_k4(self, small_font):
        mono = _render(small_font, pipeline=0)
        piped = _render(small_font, pipeline=4)
        assert np.abs(mono).max() > 1e-3
        assert mono.shape == piped.shape
        np.testing.assert_allclose(piped, mono, atol=1e-6)

    @pytest.mark.parametrize("k", [2, 3, 5, 7])
    def test_ragged_segment_splits(self, small_font, k):
        # 0.25 s at block 128 = 87 blocks: none of these K divide it
        mono = _render(small_font, pipeline=0)
        piped = _render(small_font, pipeline=k)
        np.testing.assert_allclose(piped, mono, atol=1e-6)

    def test_int16_wire_parity(self, small_font):
        mono = _render(small_font, pipeline=0, wire="int16")
        piped = _render(small_font, pipeline=4, wire="int16")
        assert mono.dtype == np.int16 and piped.dtype == np.int16
        assert np.abs(mono.astype(np.int32)).max() > 100
        # identical f32 render up to re-fused round-off => <= 1 LSB
        assert np.abs(
            piped.astype(np.int32) - mono.astype(np.int32)
        ).max() <= 1

    def test_more_segments_than_blocks_clamps(self, small_font):
        mono = _render(small_font, pipeline=0)
        piped = _render(small_font, pipeline=1000)
        np.testing.assert_allclose(piped, mono, atol=1e-6)


class TestWindowKernelPipeline:
    """Large font (> OSC_KERNEL_MAX_WAVE): windowed-DMA kernel path."""

    def test_f32_parity(self, big_font):
        assert len(SoundFont(big_font).wave_data) > fp.OSC_KERNEL_MAX_WAVE
        mono = _render(big_font, pipeline=0, events=demo_events())
        piped = _render(big_font, pipeline=4, events=demo_events())
        assert np.abs(mono).max() > 1e-3
        np.testing.assert_allclose(piped, mono, atol=1e-6)

    def test_int16_wire_parity(self, big_font):
        mono = _render(big_font, pipeline=0, wire="int16",
                       events=demo_events())
        piped = _render(big_font, pipeline=3, events=demo_events())
        piped_i16 = _render(big_font, pipeline=3, wire="int16",
                            events=demo_events())
        assert np.abs(
            piped_i16.astype(np.int32) - mono.astype(np.int32)
        ).max() <= 1
        assert piped.dtype == np.float32


class TestPipelineGate:
    """Auto mode engages only on fused-kernel paths and long renders."""

    def test_auto_engages_on_kernel_path(self, small_font, monkeypatch):
        calls = []
        real = off._render_pipelined

        def spy(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(off, "_render_pipelined", spy)
        out = _render(small_font, pipeline=None)
        assert calls, "auto pipeline should engage under the kernel path"
        mono = _render(small_font, pipeline=0)
        np.testing.assert_allclose(out, mono, atol=1e-6)

    def test_auto_off_kernel_path_falls_back(self, small_font, monkeypatch):
        # off-TPU without FORCE_PALLAS_INTERPRET the kernel gate is
        # closed: auto must take the monolithic path (and still render).
        def boom(*a, **kw):  # pragma: no cover - should not run
            raise AssertionError("pipeline must not engage off-kernel")

        monkeypatch.setattr(off, "_render_pipelined", boom)
        s = _synth(small_font)
        midi = MidiFile(build_midi(demo_events()))
        out = off.render_midi_offline(s, midi, SECONDS, pipeline=None)
        assert np.isfinite(out).all()

    def test_short_render_stays_monolithic(self, small_font, monkeypatch):
        # 4 blocks < 2 * PIPELINE_SEGMENTS: auto clamps to monolithic
        def boom(*a, **kw):  # pragma: no cover - should not run
            raise AssertionError("pipeline must not engage on 4 blocks")

        monkeypatch.setattr(off, "_render_pipelined", boom)
        out = _render(small_font, pipeline=None,
                      seconds=4 * 128 / SR)
        assert np.isfinite(out).all()

    def test_explicit_pipeline_off_kernel_ignored(self, small_font):
        # explicit pipeline=4 off the kernel path silently renders
        # monolithic (the gate re-checks _pipeline_kernel_ok)
        s = _synth(small_font)
        midi = MidiFile(build_midi(demo_events()))
        a = off.render_midi_offline(s, midi, SECONDS, pipeline=4)
        s2 = _synth(small_font)
        b = off.render_midi_offline(s2, midi, SECONDS, pipeline=0)
        np.testing.assert_allclose(a, b, atol=0.0)


class TestSegmentStateThreading:
    """Segments that additionally subdivide past the kernel's VMEM
    budget: the host segment loop and the in-dispatch sublooping must
    compose (state flows host segment -> sub-launch -> host segment)."""

    def test_resident_sublooped(self, small_font, monkeypatch):
        monkeypatch.setattr(fp, "OSC_KERNEL_MAX_T", 16 * 128)
        _clear_offline_jit_caches()
        try:
            mono = _render(small_font, pipeline=0)
            piped = _render(small_font, pipeline=3)
        finally:
            monkeypatch.undo()
            _clear_offline_jit_caches()
        np.testing.assert_allclose(piped, mono, atol=1e-6)

    def test_window_sublooped(self, big_font, monkeypatch):
        monkeypatch.setattr(fp, "WINDOW_KERNEL_MAX_T", 16 * 128)
        _clear_offline_jit_caches()
        try:
            mono = _render(big_font, pipeline=0,
                           events=demo_events())
            piped = _render(big_font, pipeline=3,
                            events=demo_events())
        finally:
            monkeypatch.undo()
            _clear_offline_jit_caches()
        np.testing.assert_allclose(piped, mono, atol=1e-6)
