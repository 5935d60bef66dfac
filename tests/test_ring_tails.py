"""Ring-tail and streaming-correctness regressions (ADVICE round 1).

Three advisor findings:
1. ConvolvePE pulled its source over overlapping windows, so a stateful
   source under ReverbPE was traced twice per block at different offsets
   and its state reset mid-stream — block-by-block diverged from one-shot
   by ~1e-2. Fixed by carrying the (L-1) input history in engine state
   (reference: convolve_pe.py:254-340 overlap-save tail).
2. The central extent mask zeroed a ringing child's IIR decay tail at
   every non-opted-out parent (GainPE(BiquadPE(src), 1.0) returned 0.0
   past the source extent where the reference rings). Fixed by
   propagating _fills_own_edges through pass-through parents.
3. Trace-time pruning (static starts) cut ring tails the dynamic path
   produced. Fixed by skipping the prune for edge-filling PEs.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core import engine
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


def _ir(n=400, tau=80.0):
    return np.exp(-np.arange(n) / tau).astype(np.float32) * 0.3


class TestConvolveStreaming:
    """ConvolvePE / ReverbPE must stream stateful sources contiguously."""

    def _reverb_graph(self):
        src = pg.CropPE(pg.NoisePE(), 0, 6000)
        filt = pg.BiquadPE(src, 1200.0, 2.0)
        return pg.ReverbPE(filt, pg.ArrayPE(_ir()), mix=0.4)

    def test_reverb_over_stateful_source_chunked_matches_oneshot(self):
        one = self._reverb_graph().render(0, 6000).data
        g = self._reverb_graph()
        chunked = np.concatenate(
            [g.render(s, 500).data for s in range(0, 6000, 500)], axis=0
        )
        assert np.abs(one - chunked).max() < 1e-5

    @pytest.mark.parametrize("block", [64, 333, 1024])
    def test_convolve_stateful_source_any_block_size(self, block):
        def build():
            return pg.ConvolvePE(
                pg.BiquadPE(pg.CropPE(pg.NoisePE(), 0, 4000), 900.0, 1.0),
                pg.ArrayPE(_ir(256)),
            )

        one = build().render(0, 4096).data
        g = build()
        parts = [
            g.render(s, min(block, 4096 - s)).data
            for s in range(0, 4096, block)
        ]
        # different block boundaries shift the overlap-save frame phase;
        # f32 FFT round-off differs but stays inside the 1e-4 parity budget
        assert np.abs(one - np.concatenate(parts)).max() < 1e-4

    def test_convolve_noncontiguous_request_clears_history(self):
        """A gap resets the carried tail to zeros — reference semantics
        (convolve_pe.py:254-256), not a stale-tail artifact."""
        fir = pg.ArrayPE(np.ones(64, np.float32))
        g = pg.ConvolvePE(pg.CropPE(pg.ConstantPE(1.0), 0, 100000), fir)
        g.render(0, 512)
        # jump far ahead (non-contiguous): history zeroed, so the first
        # 63 samples ramp up as if the note had just started
        out = g.render(50000, 128).data[:, 0]
        expect = np.minimum(np.arange(1, 129), 64).astype(np.float32)
        assert np.abs(out - expect).max() < 1e-4


class TestRingTailPropagation:
    """IIR decay tails must survive pass-through parents (reference:
    GainPE/MixPE _render never masks by extent)."""

    def _tailed(self):
        src = pg.CropPE(pg.SinePE(frequency=440.0), 0, 1000)
        return pg.BiquadPE(src, 800.0, 5.0)

    def test_unity_gain_keeps_tail(self):
        direct = self._tailed().render(0, 1400).data
        gained = pg.GainPE(self._tailed(), 1.0).render(0, 1400).data
        assert np.abs(direct[1100:]).max() > 0.01  # tail actually rings
        np.testing.assert_allclose(gained, direct, atol=1e-6)

    def test_finite_mix_keeps_tail(self):
        direct = self._tailed().render(0, 1400).data
        silent = pg.CropPE(pg.ConstantPE(0.0), 0, 500)
        mixed = pg.MixPE([self._tailed(), silent]).render(0, 1400).data
        np.testing.assert_allclose(mixed, direct, atol=1e-6)

    def test_crop_window_wider_than_source_keeps_tail(self):
        """CropPE masks its own window, not the intersected extent."""
        direct = self._tailed().render(0, 1400).data
        cropped = pg.CropPE(self._tailed(), 0, 1300).render(0, 1400).data
        np.testing.assert_allclose(cropped[:1300], direct[:1300], atol=1e-6)
        assert np.all(cropped[1300:] == 0.0)

    def test_static_prune_keeps_tail(self):
        """run_static blocks fully outside the extent still ring."""
        direct = self._tailed().render(0, 1400).data
        g = self._tailed()
        prog = engine.get_program(g, 100)
        outs = [np.asarray(prog.run_static(s)) for s in range(0, 1400, 100)]
        static_out = np.concatenate(outs)
        assert np.abs(static_out[1100:]).max() > 0.01
        np.testing.assert_allclose(static_out, direct, atol=2e-4)

    def test_tail_through_convolve(self):
        """A ringing source under ConvolvePE keeps ringing into the FIR."""
        fir = pg.ArrayPE(np.array([1.0], np.float32))  # identity FIR
        direct = self._tailed().render(0, 1400).data
        conv = pg.ConvolvePE(self._tailed(), fir).render(0, 1400).data
        np.testing.assert_allclose(conv, direct, atol=1e-6)
