"""CropPE / SetExtentPE / DelayPE behavior breadth.

Mirrors reference tests/test_crop_pe.py:25-600 and
tests/test_delay_pe.py basics not already covered by
test_delay_piecewise.py: construction surfaces, extent algebra across
window/source overlap cases, renders across every window placement,
extend-mode holds, and composition with other PEs.
"""

import numpy as np
import pytest

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    DelayPE,
    GainPE,
    IdentityPE,
    MixPE,
    SetExtentPE,
    SinePE,
)
from pygmu2_tpu.core.extent import ExtendMode, Extent
from pygmu2_tpu.models.modes import InterpolationMode
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


def ramp(n=100):
    return ArrayPE(np.arange(n, dtype=np.float32))


class TestCropPEBasics:
    def test_create_stores_window(self):
        pe = CropPE(ramp(), 10, 50)
        assert pe.start == 10
        assert pe.duration == 50
        assert pe.end == 60

    def test_create_zero_start(self):
        assert CropPE(ramp(), 0, 20).crop_extent == Extent(0, 20)

    def test_create_open_end(self):
        pe = CropPE(IdentityPE(), 5, None)
        assert pe.duration is None and pe.end is None

    def test_negative_duration_raises(self):
        with pytest.raises(ValueError, match=">= 0"):
            CropPE(ramp(), 0, -1)

    def test_inputs(self):
        src = ramp()
        pe = CropPE(src, 0, 10)
        assert pe.inputs() == [src]
        assert pe.source is src

    def test_is_pure(self):
        assert CropPE(ramp(), 0, 10).is_pure() is True

    def test_channel_count_passthrough(self):
        stereo = ArrayPE(np.zeros((20, 2), np.float32))
        assert CropPE(stereo, 0, 10).channel_count() == 2

    def test_repr(self):
        r = repr(CropPE(ramp(), 5, 10))
        assert "CropPE" in r and "start=5" in r and "end=15" in r

    def test_repr_mentions_extend_mode_when_set(self):
        r = repr(CropPE(ramp(), 0, 10, extend_mode=ExtendMode.HOLD_LAST))
        assert "extend_mode" in r

    def test_repr_plain_mode_omits_extend(self):
        assert "extend_mode" not in repr(CropPE(ramp(), 0, 10))


class TestCropPEExtent:
    def test_infinite_source_takes_window(self):
        assert CropPE(IdentityPE(), 10, 40).extent() == Extent(10, 50)

    def test_finite_source_fully_contains_crop(self):
        assert CropPE(ramp(100), 20, 30).extent() == Extent(20, 50)

    def test_crop_extends_before_source(self):
        # window [-50, 30) ∩ source [0, 100) = [0, 30)
        assert CropPE(ramp(100), -50, 80).extent() == Extent(0, 30)

    def test_crop_extends_after_source(self):
        assert CropPE(ramp(100), 80, 200).extent() == Extent(80, 100)

    def test_no_overlap_is_empty(self):
        ext = CropPE(ramp(100), 200, 50).extent()
        assert ext.is_empty()

    def test_open_end_finite_source(self):
        assert CropPE(ramp(100), 30, None).extent() == Extent(30, 100)

    def test_open_end_infinite_source(self):
        ext = CropPE(IdentityPE(), 30, None).extent()
        assert ext.start == 30 and ext.end is None


class TestCropPERender:
    def test_fully_inside_window(self):
        d = np.asarray(CropPE(ramp(), 10, 50).render(20, 10).data)[:, 0]
        np.testing.assert_array_equal(d, np.arange(20, 30, dtype=np.float32))

    def test_fully_before_window(self):
        d = np.asarray(CropPE(ramp(), 50, 10).render(0, 20).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_fully_after_window(self):
        d = np.asarray(CropPE(ramp(), 10, 20).render(50, 20).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_spanning_window_start(self):
        d = np.asarray(CropPE(ramp(), 10, 80).render(5, 10).data)[:, 0]
        np.testing.assert_array_equal(d[:5], 0.0)
        np.testing.assert_array_equal(d[5:], np.arange(10, 15, dtype=np.float32))

    def test_spanning_window_end(self):
        d = np.asarray(CropPE(ramp(), 0, 20).render(15, 10).data)[:, 0]
        np.testing.assert_array_equal(d[:5], np.arange(15, 20, dtype=np.float32))
        np.testing.assert_array_equal(d[5:], 0.0)

    def test_spanning_entire_window(self):
        d = np.asarray(CropPE(ramp(), 40, 5).render(30, 25).data)[:, 0]
        np.testing.assert_array_equal(d[:10], 0.0)
        np.testing.assert_array_equal(d[10:15], np.arange(40, 45, dtype=np.float32))
        np.testing.assert_array_equal(d[15:], 0.0)

    def test_identity_source_passthrough_inside(self):
        d = np.asarray(CropPE(IdentityPE(), 100, 50).render(120, 5).data)[:, 0]
        np.testing.assert_array_equal(d, [120, 121, 122, 123, 124])

    def test_stereo_cropped(self):
        data = np.column_stack(
            [np.arange(50), -np.arange(50)]
        ).astype(np.float32)
        d = np.asarray(CropPE(ArrayPE(data), 10, 20).render(5, 10).data)
        np.testing.assert_array_equal(d[:5], 0.0)
        np.testing.assert_array_equal(d[5:, 0], np.arange(10, 15))
        np.testing.assert_array_equal(d[5:, 1], -np.arange(10, 15))

    def test_open_end_passes_source_tail(self):
        d = np.asarray(CropPE(ramp(30), 10, None).render(25, 10).data)[:, 0]
        np.testing.assert_array_equal(d[:5], np.arange(25, 30, dtype=np.float32))
        np.testing.assert_array_equal(d[5:], 0.0)

    def test_crop_infinite_sine_silent_outside(self):
        pe = CropPE(SinePE(frequency=440.0), 0, 1000)
        np.testing.assert_array_equal(np.asarray(pe.render(1000, 100).data), 0.0)
        assert np.abs(np.asarray(pe.render(0, 100).data)).max() > 0


class TestCropPEExtendModes:
    def test_hold_first_before_window(self):
        pe = CropPE(ramp(), 10, 20, extend_mode=ExtendMode.HOLD_FIRST)
        d = np.asarray(pe.render(0, 15).data)[:, 0]
        np.testing.assert_array_equal(d[:10], 10.0)  # held first sample
        np.testing.assert_array_equal(d[10:], np.arange(10, 15, dtype=np.float32))

    def test_hold_last_after_window(self):
        pe = CropPE(ramp(), 0, 20, extend_mode=ExtendMode.HOLD_LAST)
        d = np.asarray(pe.render(15, 10).data)[:, 0]
        np.testing.assert_array_equal(d[:5], np.arange(15, 20, dtype=np.float32))
        np.testing.assert_array_equal(d[5:], 19.0)  # held last sample

    def test_hold_both(self):
        pe = CropPE(ramp(), 10, 10, extend_mode=ExtendMode.HOLD_BOTH)
        d = np.asarray(pe.render(5, 20).data)[:, 0]
        np.testing.assert_array_equal(d[:5], 10.0)
        np.testing.assert_array_equal(d[5:15], np.arange(10, 20, dtype=np.float32))
        np.testing.assert_array_equal(d[15:], 19.0)

    def test_hold_first_on_infinite_source(self):
        pe = CropPE(IdentityPE(), 100, 10, extend_mode=ExtendMode.HOLD_FIRST)
        d = np.asarray(pe.render(95, 10).data)[:, 0]
        np.testing.assert_array_equal(d[:5], 100.0)
        np.testing.assert_array_equal(d[5:], np.arange(100, 105, dtype=np.float32))


class TestCropPEComposition:
    def test_crop_then_delay(self):
        pe = DelayPE(CropPE(IdentityPE(), 0, 10), delay=5)
        d = np.asarray(pe.render(0, 20).data)[:, 0]
        np.testing.assert_array_equal(d[:5], 0.0)
        np.testing.assert_array_equal(d[5:15], np.arange(10, dtype=np.float32))
        np.testing.assert_array_equal(d[15:], 0.0)

    def test_crop_chain_intersects(self):
        pe = CropPE(CropPE(IdentityPE(), 10, 80), 50, 100)
        assert pe.extent() == Extent(50, 90)
        d = np.asarray(pe.render(45, 10).data)[:, 0]
        np.testing.assert_array_equal(d[:5], 0.0)
        np.testing.assert_array_equal(d[5:], np.arange(50, 55, dtype=np.float32))

    def test_mix_two_cropped_segments(self):
        a = CropPE(ConstantPE(1.0), 0, 10)
        b = CropPE(ConstantPE(2.0), 5, 10)
        d = np.asarray(MixPE(a, b).render(0, 20).data)[:, 0]
        np.testing.assert_array_equal(d[:5], 1.0)
        np.testing.assert_array_equal(d[5:10], 3.0)
        np.testing.assert_array_equal(d[10:15], 2.0)
        np.testing.assert_array_equal(d[15:], 0.0)

    def test_crop_to_another_pe_extent(self):
        other = ramp(37)
        pe = CropPE(IdentityPE(), other.extent().start, other.extent().end)
        assert pe.extent() == other.extent()

    def test_trim_start_and_end(self):
        trimmed = CropPE(ramp(100), 10, 80)  # drop first 10 and last 10
        assert trimmed.extent() == Extent(10, 90)


class TestSetExtentPE:
    def test_extent_not_intersected(self):
        # Unlike Crop, the forced extent can exceed the source's.
        pe = SetExtentPE(ramp(10), 0, 50)
        assert pe.extent() == Extent(0, 50)

    def test_pad_region_zero_mode(self):
        d = np.asarray(SetExtentPE(ramp(10), 0, 20).render(0, 20).data)[:, 0]
        np.testing.assert_array_equal(d[:10], np.arange(10, dtype=np.float32))
        np.testing.assert_array_equal(d[10:], 0.0)

    def test_negative_duration_raises(self):
        with pytest.raises(ValueError):
            SetExtentPE(ramp(), 0, -5)


class TestDelayPEBasics:
    def test_delay_property_int(self):
        assert DelayPE(ramp(), 7).delay == 7

    def test_int_float_collapses_to_int_mode(self):
        pe = DelayPE(ramp(), 4.0)  # whole-number float == int delay
        assert pe.delay == 4
        d = np.asarray(pe.render(4, 4).data)[:, 0]
        np.testing.assert_array_equal(d, [0, 1, 2, 3])

    def test_interpolation_property(self):
        pe = DelayPE(ramp(), 0.5, interpolation=InterpolationMode.CUBIC)
        assert pe.interpolation == InterpolationMode.CUBIC

    def test_inputs_without_pe_delay(self):
        src = ramp()
        assert DelayPE(src, 3).inputs() == [src]

    def test_inputs_with_pe_delay(self):
        src, dly = ramp(), ConstantPE(3.0)
        assert DelayPE(src, dly).inputs() == [src, dly]

    def test_is_pure(self):
        assert DelayPE(ramp(), 3).is_pure() is True

    def test_channel_count_passthrough(self):
        stereo = ArrayPE(np.zeros((8, 2), np.float32))
        assert DelayPE(stereo, 3).channel_count() == 2


class TestDelayPEExtent:
    def test_int_delay_shifts_extent(self):
        assert DelayPE(ramp(100), 25).extent() == Extent(25, 125)

    def test_negative_delay_advances(self):
        assert DelayPE(ramp(100), -25).extent() == Extent(-25, 75)

    def test_float_delay_widens_to_integers(self):
        ext = DelayPE(ramp(100), 2.5).extent()
        assert ext.start == 2 and ext.end == 103

    def test_infinite_source_stays_infinite(self):
        ext = DelayPE(SinePE(frequency=100.0), 1000).extent()
        assert ext.start is None and ext.end is None


class TestDelayPERender:
    def test_zero_delay_is_identity(self):
        d = np.asarray(DelayPE(ramp(10), 0).render(0, 10).data)[:, 0]
        np.testing.assert_array_equal(d, np.arange(10, dtype=np.float32))

    def test_negative_delay_advances_signal(self):
        d = np.asarray(DelayPE(IdentityPE(), -10).render(0, 5).data)[:, 0]
        np.testing.assert_array_equal(d, [10, 11, 12, 13, 14])

    def test_stereo_delayed_together(self):
        data = np.column_stack([np.arange(20), 20 - np.arange(20)]).astype(np.float32)
        d = np.asarray(DelayPE(ArrayPE(data), 5).render(5, 5).data)
        np.testing.assert_array_equal(d[:, 0], np.arange(5, dtype=np.float32))
        np.testing.assert_array_equal(d[:, 1], 20 - np.arange(5, dtype=np.float32))

    def test_chained_delays_sum(self):
        pe = DelayPE(DelayPE(IdentityPE(), 10), 15)
        d = np.asarray(pe.render(100, 3).data)[:, 0]
        np.testing.assert_array_equal(d, [75, 76, 77])

    def test_delay_of_gain_commutes(self):
        a = np.asarray(DelayPE(GainPE(IdentityPE(), 2.0), 5).render(50, 8).data)
        b = np.asarray(GainPE(DelayPE(IdentityPE(), 5), 2.0).render(50, 8).data)
        np.testing.assert_allclose(a, b, atol=1e-6)
