"""ResetPE coverage.

The reference ships reset_pe only as a disabled draft whose tests are
skipped (reference: tests/test_reset_pe.py:13 importorskip); this suite
covers the repo's live implementation with the same behavior matrix:
passthrough before the first edge, time re-anchoring on every rising
edge, rapid/held triggers, chunk-boundary continuation, and stateful
sources restarting from their own origin.
"""

import numpy as np
import pytest

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    IdentityPE,
    ResetPE,
)
from pygmu2_tpu.core.extent import Extent


def ident(n=64):
    """Finite identity: value == absolute index over [0, n)."""
    return CropPE(IdentityPE(), 0, n)


def trig_of(bits):
    return ArrayPE(np.asarray(bits, np.float32))


def render(pe, start, dur):
    return np.asarray(pe.render(start, dur).data)[:, 0]


class TestResetPEBasics:
    def test_create_stores_source_and_trigger(self):
        src, trig = ident(), trig_of([0, 1])
        pe = ResetPE(src, trig)
        assert pe.source is src and pe.trigger is trig

    def test_is_not_pure(self):
        assert ResetPE(ident(), trig_of([0, 1])).is_pure() is False

    def test_state_does_not_decay(self):
        assert ResetPE(ident(), trig_of([0, 1])).state_decays() is False

    def test_channel_count_from_source(self):
        stereo = ArrayPE(np.ones((8, 2), np.float32))
        assert ResetPE(stereo, trig_of([0, 1])).channel_count() == 2

    def test_extent_from_trigger(self):
        pe = ResetPE(ident(), trig_of([0, 1, 1, 0]))
        assert pe.extent() == Extent(0, 4)

    def test_infinite_source_rejected(self):
        pe = ResetPE(IdentityPE(), trig_of([0, 1]))
        with pytest.raises(ValueError, match="finite extent"):
            pe.render(0, 4)

    def test_repr_names_source_and_trigger(self):
        r = repr(ResetPE(ident(), trig_of([0, 1])))
        assert "ResetPE" in r and "CropPE" in r and "ArrayPE" in r


class TestResetPETimeShifting:
    def test_reset_at_start(self):
        pe = ResetPE(ident(), trig_of([1, 1, 1, 1, 1]))
        np.testing.assert_array_equal(render(pe, 0, 5), [0, 1, 2, 3, 4])

    def test_passthrough_before_first_edge(self):
        # trigger low for 3 samples then high: identity continues at
        # absolute time until the reset re-anchors it
        pe = ResetPE(ident(), trig_of([0, 0, 0, 1, 1, 1, 1, 1]))
        np.testing.assert_array_equal(
            render(pe, 0, 8), [0, 1, 2, 0, 1, 2, 3, 4]
        )

    def test_multiple_resets(self):
        pe = ResetPE(ident(), trig_of([1, 0, 0, 1, 0, 0, 1, 0]))
        np.testing.assert_array_equal(
            render(pe, 0, 8), [0, 1, 2, 0, 1, 2, 0, 1]
        )

    def test_no_reset_is_pure_passthrough(self):
        pe = ResetPE(ident(), trig_of([0] * 8))
        np.testing.assert_array_equal(render(pe, 0, 8), np.arange(8))

    def test_held_trigger_resets_once(self):
        # one rising edge at sample 2; staying high re-anchors nothing
        pe = ResetPE(ident(), trig_of([0, 0, 1, 1, 1, 1, 1, 1]))
        np.testing.assert_array_equal(
            render(pe, 0, 8), [0, 1, 0, 1, 2, 3, 4, 5]
        )

    def test_rapid_triggers(self):
        pe = ResetPE(ident(), trig_of([1, 0, 1, 0, 1, 0, 1, 0]))
        np.testing.assert_array_equal(
            render(pe, 0, 8), [0, 1, 0, 1, 0, 1, 0, 1]
        )

    def test_reset_at_chunk_boundary(self):
        bits = [0, 0, 0, 0, 1, 1, 1, 1]
        whole = render(ResetPE(ident(), trig_of(bits)), 0, 8)
        pe = ResetPE(ident(), trig_of(bits))
        parts = np.concatenate([render(pe, 0, 4), render(pe, 4, 4)])
        np.testing.assert_array_equal(parts, whole)
        np.testing.assert_array_equal(whole, [0, 1, 2, 3, 0, 1, 2, 3])

    def test_edge_spanning_blocks_detected(self):
        # trigger goes high exactly at the first sample of block 2; the
        # previous-sample carry must see the low sample before it
        bits = [0, 0, 0, 1, 1, 1]
        pe = ResetPE(ident(), trig_of(bits))
        a = render(pe, 0, 3)
        b = render(pe, 3, 3)
        np.testing.assert_array_equal(np.concatenate([a, b]),
                                      [0, 1, 2, 0, 1, 2])

    def test_source_with_offset_extent(self):
        # source alive over [10, 20): passthrough is silent before 10;
        # a reset at t=4 re-anchors, so the source's own 10-sample delay
        # applies from the reset
        src = CropPE(IdentityPE(), 10, 10)
        pe = ResetPE(src, trig_of([0, 0, 0, 0, 1] + [1] * 15))
        d = render(pe, 0, 20)
        np.testing.assert_array_equal(d[:4], 0.0)       # before src start
        np.testing.assert_array_equal(d[4:14], 0.0)     # re-anchored delay
        np.testing.assert_array_equal(d[14:], np.arange(10, 16))

    def test_stateful_source_restarts_from_origin(self):
        from pygmu2_tpu import KarplusStrongPE

        pluck = CropPE(KarplusStrongPE(441.0, seed=7), 0, 400)
        bits = np.zeros(1200, np.float32)
        bits[600] = 1.0
        pe = ResetPE(pluck, ArrayPE(bits))
        d = render(pe, 0, 1200)
        # the re-anchored copy replays the identical pluck
        np.testing.assert_allclose(d[600:1000], d[0:400], atol=1e-6)
        np.testing.assert_array_equal(d[400:600], 0.0)  # clip over, no reset

    def test_stereo_passthrough_and_reset(self):
        data = np.column_stack([np.arange(8), -np.arange(8)]).astype(np.float32)
        pe = ResetPE(ArrayPE(data), trig_of([0, 0, 0, 0, 1, 0, 0, 0]))
        d = np.asarray(pe.render(0, 8).data)
        np.testing.assert_array_equal(d[:4, 0], [0, 1, 2, 3])
        np.testing.assert_array_equal(d[4:, 0], [0, 1, 2, 3])
        np.testing.assert_array_equal(d[4:, 1], [0, -1, -2, -3])
