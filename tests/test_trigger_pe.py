"""TriggerPE coverage.

The reference ships trigger_pe only as a disabled draft whose tests are
skipped (reference: tests/test_trigger_pe.py:5 importorskip); this
suite covers the repo's live implementation with the same behavior
matrix: idle, one-shot start/ignore-retrigger/replay-after-done, gated
cutoff and restart, sample-accurate edges, and block-boundary
continuation (chunked == oneshot).
"""

import numpy as np
import pytest

from pygmu2_tpu import ArrayPE, ConstantPE, IdentityPE, TriggerMode, TriggerPE
from pygmu2_tpu.core.extent import Extent


def clip(n=8):
    """Finite clip whose value is 1 + local index (nonzero everywhere)."""
    return ArrayPE(np.arange(1, n + 1, dtype=np.float32))


def gate_of(bits):
    return ArrayPE(np.asarray(bits, np.float32))


def render(pe, start, dur):
    return np.asarray(pe.render(start, dur).data)[:, 0]


class TestTriggerPEBasics:
    def test_properties(self):
        g, s = gate_of([0, 1]), clip()
        pe = TriggerPE(g, s)
        assert pe.gate is g and pe.source is s
        assert pe.mode == TriggerMode.ONE_SHOT

    def test_inputs(self):
        g, s = gate_of([0, 1]), clip()
        assert TriggerPE(g, s).inputs() == [g, s]

    def test_is_not_pure(self):
        assert TriggerPE(gate_of([0, 1]), clip()).is_pure() is False

    def test_state_does_not_decay(self):
        assert TriggerPE(gate_of([0, 1]), clip()).state_decays() is False

    def test_channel_count_from_source(self):
        stereo = ArrayPE(np.ones((8, 2), np.float32))
        assert TriggerPE(gate_of([0, 1]), stereo).channel_count() == 2

    def test_extent_from_gate(self):
        pe = TriggerPE(gate_of([0, 1, 1, 0]), clip())
        assert pe.extent() == Extent(0, 4)

    def test_infinite_source_rejected(self):
        pe = TriggerPE(gate_of([0, 1]), IdentityPE())
        with pytest.raises(ValueError, match="finite extent"):
            pe.render(0, 4)

    def test_repr(self):
        r = repr(TriggerPE(gate_of([0, 1]), clip(), mode=TriggerMode.GATED))
        assert "TriggerPE" in r and "gated" in r


class TestOneShot:
    def test_idle_without_edge(self):
        pe = TriggerPE(ConstantPE(0.0), clip())
        np.testing.assert_array_equal(render(pe, 0, 16), 0.0)

    def test_constant_high_gate_fires_once_at_start(self):
        # gate 0→1 at sample 0 is a rising edge (previous state is low)
        pe = TriggerPE(ConstantPE(1.0), clip(4))
        d = render(pe, 0, 10)
        np.testing.assert_array_equal(d[:4], [1, 2, 3, 4])
        np.testing.assert_array_equal(d[4:], 0.0)  # held high: no re-edge

    def test_one_shot_basic_delayed_edge(self):
        gate = gate_of([0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1])
        pe = TriggerPE(gate, clip(4))
        d = render(pe, 0, 12)
        np.testing.assert_array_equal(d[:3], 0.0)
        np.testing.assert_array_equal(d[3:7], [1, 2, 3, 4])
        np.testing.assert_array_equal(d[7:], 0.0)

    def test_ignores_retrigger_while_playing(self):
        # second edge at sample 2, mid-clip: ignored
        gate = gate_of([1, 0, 1, 0, 0, 0, 0, 0])
        pe = TriggerPE(gate, clip(6))
        d = render(pe, 0, 8)
        np.testing.assert_array_equal(d[:6], [1, 2, 3, 4, 5, 6])
        np.testing.assert_array_equal(d[6:], 0.0)

    def test_retrigger_after_clip_done(self):
        gate = gate_of([1, 0, 0, 0, 0, 1, 0, 0, 0, 0])
        pe = TriggerPE(gate, clip(4))
        d = render(pe, 0, 10)
        np.testing.assert_array_equal(d[:4], [1, 2, 3, 4])
        assert d[4] == 0.0
        np.testing.assert_array_equal(d[5:9], [1, 2, 3, 4])

    def test_edge_exactly_at_clip_end_retriggers(self):
        gate = gate_of([1, 0, 0, 0, 1, 0, 0, 0])
        pe = TriggerPE(gate, clip(4))
        d = render(pe, 0, 8)
        np.testing.assert_array_equal(d, [1, 2, 3, 4, 1, 2, 3, 4])

    def test_gate_drop_does_not_cut_one_shot(self):
        gate = gate_of([1, 0, 0, 0, 0, 0, 0, 0])
        pe = TriggerPE(gate, clip(6))
        d = render(pe, 0, 8)
        np.testing.assert_array_equal(d[:6], [1, 2, 3, 4, 5, 6])

    def test_block_boundary_continuation(self):
        gate_bits = [0, 0, 1] + [1] * 13
        whole = render(TriggerPE(gate_of(gate_bits), clip(8)), 0, 16)
        pe = TriggerPE(gate_of(gate_bits), clip(8))
        parts = np.concatenate([render(pe, 0, 4), render(pe, 4, 4),
                                render(pe, 8, 4), render(pe, 12, 4)])
        np.testing.assert_array_equal(parts, whole)

    def test_one_shot_ignore_spans_blocks(self):
        # clip of 6; retrigger edge in the SECOND block while playing
        gate_bits = [1, 0, 0, 0, 1, 0, 0, 0]  # edge at 4 mid-clip
        pe = TriggerPE(gate_of(gate_bits), clip(6))
        a = render(pe, 0, 4)
        b = render(pe, 4, 4)
        np.testing.assert_array_equal(np.concatenate([a, b])[:6],
                                      [1, 2, 3, 4, 5, 6])


class TestGated:
    def test_gated_cutoff_on_gate_drop(self):
        gate = gate_of([1, 1, 1, 0, 0, 0, 0, 0])
        pe = TriggerPE(gate, clip(6), mode=TriggerMode.GATED)
        d = render(pe, 0, 8)
        np.testing.assert_array_equal(d[:3], [1, 2, 3])
        np.testing.assert_array_equal(d[3:], 0.0)

    def test_gated_no_retrigger_while_high(self):
        gate = gate_of([1, 1, 1, 1, 1, 1, 1, 1])
        pe = TriggerPE(gate, clip(4), mode=TriggerMode.GATED)
        d = render(pe, 0, 8)
        np.testing.assert_array_equal(d[:4], [1, 2, 3, 4])
        np.testing.assert_array_equal(d[4:], 0.0)  # clip over, gate high

    def test_gated_retrigger_when_gate_high_again(self):
        gate = gate_of([1, 1, 0, 0, 1, 1, 1, 0])
        pe = TriggerPE(gate, clip(6), mode=TriggerMode.GATED)
        d = render(pe, 0, 8)
        np.testing.assert_array_equal(d[:2], [1, 2])
        np.testing.assert_array_equal(d[2:4], 0.0)
        np.testing.assert_array_equal(d[4:7], [1, 2, 3])
        assert d[7] == 0.0

    def test_gated_restarts_mid_clip_on_new_edge(self):
        gate = gate_of([1, 1, 0, 1, 1, 1, 1, 1])
        pe = TriggerPE(gate, clip(6), mode=TriggerMode.GATED)
        d = render(pe, 0, 8)
        np.testing.assert_array_equal(d[:2], [1, 2])
        assert d[2] == 0.0
        np.testing.assert_array_equal(d[3:8], [1, 2, 3, 4, 5])

    def test_gated_block_boundary_continuation(self):
        gate_bits = [1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1]
        whole = render(
            TriggerPE(gate_of(gate_bits), clip(8), mode=TriggerMode.GATED),
            0, 12,
        )
        pe = TriggerPE(gate_of(gate_bits), clip(8), mode=TriggerMode.GATED)
        parts = np.concatenate([render(pe, 0, 6), render(pe, 6, 6)])
        np.testing.assert_array_equal(parts, whole)

    def test_stereo_clip(self):
        data = np.column_stack([np.arange(1, 5), -np.arange(1, 5)]).astype(np.float32)
        gate = gate_of([0, 1, 1, 1, 1, 1])
        pe = TriggerPE(gate, ArrayPE(data), mode=TriggerMode.GATED)
        d = np.asarray(pe.render(0, 6).data)
        np.testing.assert_array_equal(d[1:5, 0], [1, 2, 3, 4])
        np.testing.assert_array_equal(d[1:5, 1], [-1, -2, -3, -4])
