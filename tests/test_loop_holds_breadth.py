"""LoopPE / SampleHoldPE / TrackHoldPE / TriggerRestartPE breadth.

Mirrors reference tests/test_loop_pe.py:23-380,
test_sample_hold_pe.py:52-230, test_track_hold_pe.py:52-220, and
test_reset_pe.py:31-340 behaviors not already covered by
test_loop_slice_sequence.py / test_control_pes.py / test_parity_holes.py.
"""

import numpy as np
import pytest

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    PeriodicGate,
    IdentityPE,
    LoopPE,
    PeriodicTrigger,
    SampleHoldPE,
    SinePE,
    TrackHoldPE,
    TriggerRestartPE,
)
from pygmu2_tpu.core.extent import Extent
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


def ramp(n=100):
    return ArrayPE(np.arange(n, dtype=np.float32))


class TestLoopPEBasics:
    def test_create_default_region_from_source(self):
        pe = LoopPE(ramp(50))
        assert pe.loop_start is None and pe.loop_end is None
        assert pe.count is None
        assert pe.crossfade_seconds == 0.0

    def test_create_with_params(self):
        pe = LoopPE(ramp(100), loop_start=10, loop_end=60, count=3,
                    crossfade_seconds=0.0001)
        assert pe.loop_start == 10 and pe.loop_end == 60
        assert pe.count == 3
        assert pe.crossfade_samples == round(0.0001 * 44100)

    def test_crossfade_clamped_to_half_loop(self):
        pe = LoopPE(ramp(20), crossfade_seconds=1.0)  # 44100 ≫ loop/2
        assert pe.crossfade_samples == 10

    def test_negative_crossfade_raises(self):
        with pytest.raises(ValueError, match="non-negative"):
            LoopPE(ramp(20), crossfade_seconds=-0.1)

    def test_inputs(self):
        src = ramp(10)
        assert LoopPE(src).inputs() == [src]

    def test_is_pure(self):
        assert LoopPE(ramp(10)).is_pure() is True

    def test_channel_count_passthrough(self):
        stereo = ArrayPE(np.zeros((20, 2), np.float32))
        assert LoopPE(stereo).channel_count() == 2

    def test_repr(self):
        r = repr(LoopPE(ramp(10), loop_start=2, loop_end=8, count=4))
        assert "LoopPE" in r and "count=4" in r and "loop_start=2" in r

    def test_invalid_loop_length_raises(self):
        with pytest.raises(ValueError, match="positive"):
            LoopPE(ramp(50), loop_start=30, loop_end=30)

    def test_infinite_source_without_end_raises(self):
        with pytest.raises(ValueError, match="infinite"):
            LoopPE(IdentityPE())

    def test_infinite_source_with_explicit_end_ok(self):
        pe = LoopPE(IdentityPE(), loop_start=0, loop_end=64)
        d = np.asarray(pe.render(64, 4).data)[:, 0]
        np.testing.assert_array_equal(d, [0, 1, 2, 3])


class TestLoopPEExtent:
    def test_infinite_loop_extent(self):
        ext = LoopPE(ramp(50)).extent()
        assert ext.start == 0 and ext.end is None

    def test_finite_loop_extent(self):
        assert LoopPE(ramp(50), count=4).extent() == Extent(0, 200)

    def test_custom_region_extent(self):
        pe = LoopPE(ramp(100), loop_start=20, loop_end=30, count=5)
        assert pe.extent() == Extent(0, 50)


class TestLoopPERender:
    def test_single_iteration_matches_source(self):
        d = np.asarray(LoopPE(ramp(50)).render(0, 50).data)[:, 0]
        np.testing.assert_array_equal(d, np.arange(50, dtype=np.float32))

    def test_second_iteration_repeats(self):
        d = np.asarray(LoopPE(ramp(50)).render(50, 50).data)[:, 0]
        np.testing.assert_array_equal(d, np.arange(50, dtype=np.float32))

    def test_wrap_mid_window(self):
        d = np.asarray(LoopPE(ramp(50)).render(45, 10).data)[:, 0]
        np.testing.assert_array_equal(
            d, np.concatenate([np.arange(45, 50), np.arange(5)]).astype(np.float32)
        )

    def test_custom_loop_region_reanchors_to_zero(self):
        pe = LoopPE(ramp(100), loop_start=20, loop_end=25)
        d = np.asarray(pe.render(0, 10).data)[:, 0]
        np.testing.assert_array_equal(d, [20, 21, 22, 23, 24] * 2)

    def test_stops_after_count(self):
        pe = LoopPE(ramp(10), count=2)
        d = np.asarray(pe.render(0, 30).data)[:, 0]
        np.testing.assert_array_equal(d[:20], list(range(10)) * 2)
        np.testing.assert_array_equal(d[20:], 0.0)

    def test_partial_final_window(self):
        pe = LoopPE(ramp(10), count=2)
        d = np.asarray(pe.render(15, 10).data)[:, 0]
        np.testing.assert_array_equal(d[:5], [5, 6, 7, 8, 9])
        np.testing.assert_array_equal(d[5:], 0.0)

    def test_crossfade_smooths_seam(self):
        # a ramp loops with a huge step at the seam; crossfade shrinks it
        n = 1000
        src = ArrayPE(np.linspace(0, 1, n, dtype=np.float32))
        hard = np.asarray(LoopPE(src).render(0, 2 * n).data)[:, 0]
        soft = np.asarray(
            LoopPE(src, crossfade_seconds=100 / 44100).render(0, 2 * n).data
        )[:, 0]
        hard_jump = np.abs(np.diff(hard)).max()
        soft_jump = np.abs(np.diff(soft)).max()
        assert soft_jump < hard_jump / 5

    def test_stereo_looping(self):
        data = np.column_stack([np.arange(10), -np.arange(10)]).astype(np.float32)
        d = np.asarray(LoopPE(ArrayPE(data)).render(10, 10).data)
        np.testing.assert_array_equal(d, data)

    def test_before_zero_is_silent(self):
        d = np.asarray(LoopPE(ramp(10)).render(-20, 10).data)
        np.testing.assert_array_equal(d, 0.0)


class TestSampleHoldPEBreadth:
    def test_default_initial_value(self):
        pe = SampleHoldPE(ConstantPE(1.0), PeriodicTrigger(hz=100.0))
        assert pe.initial_value == 0.0

    def test_custom_initial_value(self):
        pe = SampleHoldPE(ConstantPE(1.0), PeriodicTrigger(hz=100.0),
                          initial_value=-3.5)
        assert pe.initial_value == -3.5

    def test_inputs_exposes_source_and_trigger(self):
        src, trig = ConstantPE(1.0), PeriodicTrigger(hz=100.0)
        assert SampleHoldPE(src, trig).inputs() == [src, trig]

    def test_is_not_pure(self):
        assert SampleHoldPE(ConstantPE(1.0), PeriodicTrigger(hz=10.0)).is_pure() is False

    def test_channel_count_is_one(self):
        pe = SampleHoldPE(ConstantPE(1.0, channels=1), PeriodicTrigger(hz=10.0))
        assert pe.channel_count() == 1

    def test_repr(self):
        r = repr(SampleHoldPE(ConstantPE(1.0), PeriodicTrigger(hz=10.0)))
        assert "SampleHoldPE" in r and "PeriodicTrigger" in r

    def test_initial_value_before_first_trigger(self):
        # trigger fires at 441-sample period starting at 0; render a
        # window strictly between triggers starting mid-period
        trig = PeriodicTrigger(hz=100.0, phase=0.5)
        pe = SampleHoldPE(IdentityPE(), trig, initial_value=7.0)
        d = np.asarray(pe.render(0, 100).data)[:, 0]
        np.testing.assert_array_equal(d, 7.0)

    def test_trigger_latches_source_value(self):
        pe = SampleHoldPE(IdentityPE(), PeriodicTrigger(hz=100.0))
        d = np.asarray(pe.render(0, 882).data)[:, 0]
        np.testing.assert_array_equal(d[:441], 0.0)   # latched t=0
        np.testing.assert_array_equal(d[441:], 441.0)  # latched t=441

    def test_held_across_contiguous_renders(self):
        pe = SampleHoldPE(IdentityPE(), PeriodicTrigger(hz=100.0))
        a = np.asarray(pe.render(0, 200).data)[:, 0]
        b = np.asarray(pe.render(200, 200).data)[:, 0]
        np.testing.assert_array_equal(a, 0.0)
        np.testing.assert_array_equal(b, 0.0)  # still held until t=441

    def test_steps_with_periodic_trigger(self):
        pe = SampleHoldPE(SinePE(frequency=3.0), PeriodicTrigger(hz=441.0))
        d = np.asarray(pe.render(0, 1000).data)[:, 0]
        np.testing.assert_array_equal(d[:100], d[0])
        assert len(np.unique(d)) >= 5  # distinct plateaus

    def test_constant_source_latches_constant(self):
        pe = SampleHoldPE(ConstantPE(0.33), PeriodicTrigger(hz=441.0))
        d = np.asarray(pe.render(0, 500).data)[:, 0]
        np.testing.assert_allclose(d, 0.33, atol=1e-6)


class TestTrackHoldPEBreadth:
    def test_default_initial_value(self):
        pe = TrackHoldPE(ConstantPE(1.0), PeriodicGate(frequency=10.0))
        assert pe.initial_value == 0.0

    def test_inputs_exposes_source_and_gate(self):
        src, gate = ConstantPE(1.0), PeriodicGate(frequency=10.0)
        assert TrackHoldPE(src, gate).inputs() == [src, gate]

    def test_is_not_pure(self):
        assert TrackHoldPE(ConstantPE(1.0), PeriodicGate(frequency=10.0)).is_pure() is False

    def test_channel_count_is_one(self):
        assert TrackHoldPE(ConstantPE(1.0), PeriodicGate(frequency=10.0)).channel_count() == 1

    def test_repr(self):
        r = repr(TrackHoldPE(ConstantPE(1.0), PeriodicGate(frequency=10.0)))
        assert "TrackHoldPE" in r

    def test_tracks_while_gate_open(self):
        gate = ConstantPE(1.0)
        pe = TrackHoldPE(IdentityPE(), gate)
        d = np.asarray(pe.render(0, 50).data)[:, 0]
        np.testing.assert_array_equal(d, np.arange(50, dtype=np.float32))

    def test_initial_value_while_gate_closed(self):
        gate = ConstantPE(0.0)
        pe = TrackHoldPE(IdentityPE(), gate, initial_value=9.0)
        d = np.asarray(pe.render(0, 50).data)[:, 0]
        np.testing.assert_array_equal(d, 9.0)

    def test_alternating_gate_tracks_and_holds(self):
        # gate open for first 25 samples, closed next 25
        gate = ArrayPE(
            np.concatenate([np.ones(25), np.zeros(25)]).astype(np.float32)
        )
        pe = TrackHoldPE(IdentityPE(), gate)
        d = np.asarray(pe.render(0, 50).data)[:, 0]
        np.testing.assert_array_equal(d[:25], np.arange(25, dtype=np.float32))
        np.testing.assert_array_equal(d[25:], 24.0)  # held last tracked

    def test_state_persists_across_contiguous_renders(self):
        gate = ArrayPE(
            np.concatenate([np.ones(25), np.zeros(75)]).astype(np.float32)
        )
        pe = TrackHoldPE(IdentityPE(), gate)
        np.asarray(pe.render(0, 50).data)
        d = np.asarray(pe.render(50, 50).data)[:, 0]
        np.testing.assert_array_equal(d, 24.0)


class TestTriggerRestartPEBreadth:
    """Restart-on-trigger (the reference's reset semantics)."""

    def _clip(self):
        return ArrayPE(np.arange(20, dtype=np.float32))

    def test_inputs(self):
        trig, src = PeriodicTrigger(hz=100.0), self._clip()
        assert TriggerRestartPE(trig, src).inputs() == [trig, src]

    def test_is_not_pure(self):
        assert TriggerRestartPE(PeriodicTrigger(hz=10.0), self._clip()).is_pure() is False

    def test_repr(self):
        r = repr(TriggerRestartPE(PeriodicTrigger(hz=10.0), self._clip()))
        assert "TriggerRestartPE" in r

    def test_each_trigger_restarts_clip(self):
        pe = TriggerRestartPE(PeriodicTrigger(hz=441.0), self._clip())
        d = np.asarray(pe.render(0, 300).data)[:, 0]
        np.testing.assert_array_equal(d[0:20], np.arange(20, dtype=np.float32))
        np.testing.assert_array_equal(d[100:120], np.arange(20, dtype=np.float32))
        np.testing.assert_array_equal(d[200:220], np.arange(20, dtype=np.float32))

    def test_clip_tail_zero_until_next_trigger(self):
        pe = TriggerRestartPE(PeriodicTrigger(hz=441.0), self._clip())
        d = np.asarray(pe.render(0, 100).data)[:, 0]
        np.testing.assert_array_equal(d[20:100], 0.0)

    def test_rapid_triggers_keep_restarting(self):
        pe = TriggerRestartPE(PeriodicTrigger(hz=4410.0), self._clip())
        d = np.asarray(pe.render(0, 40).data)[:, 0]
        np.testing.assert_array_equal(d[:10], np.arange(10, dtype=np.float32))
        np.testing.assert_array_equal(d[10:20], np.arange(10, dtype=np.float32))

    def test_restart_across_chunk_boundary(self):
        whole = np.asarray(
            TriggerRestartPE(PeriodicTrigger(hz=441.0), self._clip())
            .render(0, 400).data
        )
        pe = TriggerRestartPE(PeriodicTrigger(hz=441.0), self._clip())
        parts = np.concatenate(
            [np.asarray(pe.render(s, 100).data) for s in range(0, 400, 100)]
        )
        np.testing.assert_allclose(parts, whole, atol=1e-6)
