"""Micro-edge coverage for the time-transform PEs (Delay/Crop/Slice).

Mirrors the reference's per-PE test breadth (reference
tests/test_delay_pe.py, test_crop_pe.py, test_slice_pe.py): every
constructor variant, inputs()/is_pure()/channel_count() contracts,
repr, the full extent algebra, and renders positioned before/inside/
spanning/after the PE's extent.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import Extent
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


@pytest.fixture(autouse=True)
def _sr():
    pg.set_sample_rate(SR)


def ramp(n=8, ch=1):
    data = np.arange(n, dtype=np.float32)
    if ch > 1:
        data = np.stack([data * (i + 1) for i in range(ch)], axis=1)
    return pg.ArrayPE(data)


# ---- DelayPE: integer delay ----------------------------------------------


class TestDelayInteger:
    def test_inputs_is_source_only(self):
        src = ramp()
        assert pg.DelayPE(src, 3).inputs() == [src]

    def test_is_pure(self):
        assert pg.DelayPE(ramp(), 3).is_pure()

    def test_channel_count_passthrough(self):
        assert pg.DelayPE(ramp(ch=2), 3).channel_count() == 2

    def test_repr_integer(self):
        assert "delay=3" in repr(pg.DelayPE(ramp(), 3))

    def test_extent_positive_delay(self):
        assert pg.DelayPE(ramp(8), 3).extent() == Extent(3, 11)

    def test_extent_zero_delay(self):
        assert pg.DelayPE(ramp(8), 0).extent() == Extent(0, 8)

    def test_extent_negative_delay(self):
        assert pg.DelayPE(ramp(8), -2).extent() == Extent(-2, 6)

    def test_extent_infinite_source(self):
        e = pg.DelayPE(pg.ConstantPE(1.0), 5).extent()
        assert e.start is None and e.end is None

    def test_render_shifts_right(self):
        out = pg.DelayPE(ramp(4), 2).render(0, 8).data[:, 0]
        np.testing.assert_allclose(out, [0, 0, 0, 1, 2, 3, 0, 0])

    def test_render_zero_delay_passthrough(self):
        out = pg.DelayPE(ramp(4), 0).render(0, 4).data[:, 0]
        np.testing.assert_allclose(out, [0, 1, 2, 3])

    def test_render_negative_delay_shifts_left(self):
        out = pg.DelayPE(ramp(4), -2).render(-2, 6).data[:, 0]
        np.testing.assert_allclose(out, [0, 1, 2, 3, 0, 0])

    def test_render_stereo(self):
        out = pg.DelayPE(ramp(4, ch=2), 1).render(0, 5).data
        np.testing.assert_allclose(out[:, 0], [0, 0, 1, 2, 3])
        np.testing.assert_allclose(out[:, 1], [0, 0, 2, 4, 6])

    def test_double_delay_composes(self):
        pe = pg.DelayPE(pg.DelayPE(ramp(4), 2), 3)
        assert pe.extent() == Extent(5, 9)
        out = pe.render(5, 4).data[:, 0]
        np.testing.assert_allclose(out, [0, 1, 2, 3])

    def test_large_delay(self):
        pe = pg.DelayPE(ramp(4), 10_000)
        assert pe.extent() == Extent(10_000, 10_004)
        out = pe.render(10_000, 4).data[:, 0]
        np.testing.assert_allclose(out, [0, 1, 2, 3])

    def test_whole_float_delay_exact(self):
        a = pg.DelayPE(ramp(4), 2).render(0, 6).data
        b = pg.DelayPE(ramp(4), 2.0).render(0, 6).data
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestDelayFractional:
    def test_repr_float(self):
        assert "1.5" in repr(pg.DelayPE(ramp(), 1.5))

    def test_interpolates_between_samples(self):
        # delay 0.5 on a ramp: output[n] = source(n - 0.5) = n - 0.5
        out = pg.DelayPE(ramp(8), 0.5).render(1, 6).data[:, 0]
        np.testing.assert_allclose(out, np.arange(1, 7) - 0.5, atol=1e-5)

    def test_fractional_vs_integer_bracket(self):
        frac = pg.DelayPE(ramp(8), 1.5).render(2, 4).data[:, 0]
        lo = pg.DelayPE(ramp(8), 1).render(2, 4).data[:, 0]
        hi = pg.DelayPE(ramp(8), 2).render(2, 4).data[:, 0]
        assert ((frac >= np.minimum(lo, hi) - 1e-6)
                & (frac <= np.maximum(lo, hi) + 1e-6)).all()

    def test_cubic_mode_on_smooth_signal(self):
        sine = pg.SinePE(frequency=441.0)
        lin = pg.DelayPE(sine, 0.5).render(100, 64).data
        cub = pg.DelayPE(
            sine, 0.5, interpolation=pg.InterpolationMode.CUBIC
        ).render(100, 64).data
        # both approximate the true shifted sine; cubic at least as well
        true = pg.SinePE(frequency=441.0).render(0, 1000).data
        np.testing.assert_allclose(lin, cub, atol=2e-3)

    def test_stereo_fractional(self):
        out = pg.DelayPE(ramp(6, ch=2), 0.5).render(1, 4).data
        np.testing.assert_allclose(out[:, 1], 2 * out[:, 0], atol=1e-5)


class TestDelayPE_PEControlled:
    def test_inputs_includes_delay_pe(self):
        src, dly = ramp(), pg.ConstantPE(2.0)
        pe = pg.DelayPE(src, dly, max_delay=4.0)
        assert src in pe.inputs() and dly in pe.inputs()

    def test_constant_pe_delay_matches_scalar(self):
        a = pg.DelayPE(ramp(8), pg.ConstantPE(2.0), max_delay=4.0)
        b = pg.DelayPE(ramp(8), 2.0)
        np.testing.assert_allclose(
            a.render(2, 6).data, b.render(2, 6).data, atol=1e-5
        )

    def test_varying_delay_reads_past(self):
        # delay grows 0->2 over the window; output slope < 1
        dly = pg.PiecewisePE([(0, 0.0), (8, 2.0)])
        out = pg.DelayPE(ramp(16), dly, max_delay=4.0).render(2, 6).data[:, 0]
        assert (np.diff(out) < 1.0 + 1e-6).all()
        assert (np.diff(out) > 0.0).all()

    def test_extent_follows_source(self):
        pe = pg.DelayPE(ramp(8), pg.ConstantPE(1.0), max_delay=4.0)
        assert pe.extent() == Extent(0, 8)


# ---- CropPE --------------------------------------------------------------


class TestCropExtent:
    def test_inside_finite_source(self):
        assert pg.CropPE(ramp(8), 2, 4).extent() == Extent(2, 6)

    def test_crop_extends_past_source_end(self):
        assert pg.CropPE(ramp(4), 2, 10).extent() == Extent(2, 4)

    def test_crop_starts_before_source(self):
        pe = pg.CropPE(pg.DelayPE(ramp(4), 2), 0, 4)
        assert pe.extent() == Extent(2, 4)

    def test_no_overlap_is_empty(self):
        e = pg.CropPE(ramp(4), 10, 4).extent()
        assert e.is_empty()

    def test_none_duration_runs_to_source_end(self):
        assert pg.CropPE(ramp(8), 3, None).extent() == Extent(3, 8)

    def test_none_duration_infinite_source(self):
        e = pg.CropPE(pg.ConstantPE(1.0), 3, None).extent()
        assert e.start == 3 and e.end is None

    def test_crop_infinite_source_is_finite(self):
        assert pg.CropPE(pg.ConstantPE(1.0), 5, 10).extent() == Extent(5, 15)

    def test_is_pure_and_channels(self):
        pe = pg.CropPE(ramp(8, ch=2), 0, 4)
        assert pe.is_pure() and pe.channel_count() == 2

    def test_repr_contains_bounds(self):
        r = repr(pg.CropPE(ramp(), 2, 4))
        assert "2" in r and ("6" in r or "4" in r)


class TestCropRenderWindows:
    def _pe(self):
        return pg.CropPE(ramp(8), 2, 4)  # passes through samples 2..5

    def test_window_fully_inside(self):
        np.testing.assert_allclose(
            self._pe().render(2, 4).data[:, 0], [2, 3, 4, 5]
        )

    def test_window_fully_before(self):
        np.testing.assert_allclose(self._pe().render(-4, 4).data, 0.0)

    def test_window_fully_after(self):
        np.testing.assert_allclose(self._pe().render(6, 4).data, 0.0)

    def test_window_spanning_start(self):
        np.testing.assert_allclose(
            self._pe().render(0, 4).data[:, 0], [0, 0, 2, 3]
        )

    def test_window_spanning_end(self):
        np.testing.assert_allclose(
            self._pe().render(4, 4).data[:, 0], [4, 5, 0, 0]
        )

    def test_window_spanning_both(self):
        np.testing.assert_allclose(
            self._pe().render(0, 8).data[:, 0], [0, 0, 2, 3, 4, 5, 0, 0]
        )

    def test_crop_infinite_sine_windows(self):
        sine = pg.SinePE(frequency=440.0)
        pe = pg.CropPE(sine, 100, 50)
        inside = pe.render(100, 50).data
        ref = sine.render(100, 50).data
        np.testing.assert_allclose(inside, ref, atol=1e-6)
        np.testing.assert_allclose(pe.render(150, 10).data, 0.0)

    def test_crop_chain_intersects(self):
        pe = pg.CropPE(pg.CropPE(ramp(8), 1, 6), 3, 10)
        assert pe.extent() == Extent(3, 7)
        np.testing.assert_allclose(pe.render(3, 4).data[:, 0], [3, 4, 5, 6])

    def test_crop_limits_hold_both_source(self):
        # reference regression (test_crop_pe.py:515): a HOLD_BOTH source
        # has infinite extent; CropPE must zero outside the crop window
        # while the hold fills inside it.
        src = pg.PiecewisePE(
            [(0, 10.0), (100, 20.0)], extend_mode=pg.ExtendMode.HOLD_BOTH
        )
        e = src.extent()
        assert e.start is None and e.end is None
        pe = pg.CropPE(src, 0, 200)
        out = pe.render(50, 200).data[:, 0]
        np.testing.assert_allclose(out[:50], src.render(50, 50).data[:, 0])
        np.testing.assert_allclose(out[50:150], 20.0)  # held inside crop
        np.testing.assert_allclose(out[150:], 0.0)  # zero past crop end

    def test_crop_before_hold_both_source_holds_first(self):
        # reference test_crop_pe.py:550 — crop extending before the ramp
        # exposes the held start value
        src = pg.PiecewisePE(
            [(0, 5.0), (100, 10.0)], extend_mode=pg.ExtendMode.HOLD_BOTH
        )
        out = pg.CropPE(src, -50, 100).render(-50, 100).data[:, 0]
        np.testing.assert_allclose(out[:50], 5.0, atol=1e-5)
        assert abs(out[50] - 5.0) < 0.1

    def test_mix_of_cropped_sources(self):
        a = pg.CropPE(pg.ConstantPE(1.0), 0, 4)
        b = pg.CropPE(pg.ConstantPE(2.0), 2, 4)
        out = pg.MixPE([a, b]).render(0, 6).data[:, 0]
        np.testing.assert_allclose(out, [1, 1, 3, 3, 2, 2])


# ---- SlicePE -------------------------------------------------------------


class TestSlicePE:
    def test_extracts_and_rebases(self):
        out = pg.SlicePE(ramp(8), 3, 4).render(0, 4).data[:, 0]
        np.testing.assert_allclose(out, [3, 4, 5, 6])

    def test_extent_starts_at_zero(self):
        assert pg.SlicePE(ramp(8), 3, 4).extent() == Extent(0, 4)

    def test_zero_duration_empty(self):
        assert pg.SlicePE(ramp(8), 3, 0).extent().is_empty()

    def test_slice_outside_source_is_silent(self):
        out = pg.SlicePE(ramp(4), 100, 4).render(0, 4).data
        np.testing.assert_allclose(out, 0.0)

    def test_stereo_passthrough(self):
        pe = pg.SlicePE(ramp(8, ch=2), 2, 2)
        assert pe.channel_count() == 2
        np.testing.assert_allclose(pe.render(0, 2).data[:, 1], [4, 6])

    def test_is_pure(self):
        assert pg.SlicePE(ramp(), 0, 4).is_pure()


# ---- GainPE --------------------------------------------------------------


class TestGainMicro:
    def test_default_unity(self):
        out = pg.GainPE(ramp(4)).render(0, 4).data[:, 0]
        np.testing.assert_allclose(out, [0, 1, 2, 3])

    def test_negative_gain_inverts(self):
        out = pg.GainPE(ramp(4), -1.0).render(0, 4).data[:, 0]
        np.testing.assert_allclose(out, [0, -1, -2, -3])

    def test_zero_gain_silences(self):
        np.testing.assert_allclose(
            pg.GainPE(ramp(4), 0.0).render(0, 4).data, 0.0
        )

    def test_repr_constant_gain(self):
        assert "0.5" in repr(pg.GainPE(ramp(), 0.5))

    def test_inputs_with_pe_gain(self):
        src, g = ramp(), pg.ConstantPE(0.5)
        assert set(pg.GainPE(src, g).inputs()) == {src, g}

    def test_is_pure_with_pe_gain(self):
        assert pg.GainPE(ramp(), pg.ConstantPE(0.5)).is_pure()

    def test_extent_pe_gain_intersection(self):
        src = pg.CropPE(pg.ConstantPE(1.0), 0, 100)
        g = pg.CropPE(pg.ConstantPE(0.5), 50, 100)
        assert pg.GainPE(src, g).extent() == Extent(50, 100)

    def test_extent_pe_gain_no_overlap(self):
        src = pg.CropPE(pg.ConstantPE(1.0), 0, 10)
        g = pg.CropPE(pg.ConstantPE(0.5), 50, 10)
        assert pg.GainPE(src, g).extent().is_empty()

    def test_fade_in_ramp_gain(self):
        g = pg.PiecewisePE([(0, 0.0), (4, 1.0)])
        out = pg.GainPE(pg.ConstantPE(1.0), g).render(0, 4).data[:, 0]
        np.testing.assert_allclose(out, [0, 0.25, 0.5, 0.75], atol=1e-6)

    def test_fade_in_holds_full_gain_after_ramp(self):
        g = pg.PiecewisePE(
            [(0, 0.0), (4, 1.0)], extend_mode=pg.ExtendMode.HOLD_BOTH
        )
        out = pg.GainPE(pg.ConstantPE(1.0), g).render(0, 8).data[:, 0]
        np.testing.assert_allclose(out[4:], 1.0, atol=1e-6)

    def test_tremolo_modulates(self):
        lfo = pg.SinePE(frequency=5.0, amplitude=0.5)
        car = pg.ConstantPE(1.0)
        out = pg.GainPE(car, lfo).render(0, SR // 5).data[:, 0]
        assert out.max() > 0.45 and out.min() < -0.45

    def test_simple_echo_graph(self):
        dry = ramp(4)
        echo = pg.GainPE(pg.DelayPE(dry, 4), 0.5)
        out = pg.MixPE([dry, echo]).render(0, 8).data[:, 0]
        np.testing.assert_allclose(out, [0, 1, 2, 3, 0, 0.5, 1, 1.5])

    def test_output_stays_float32(self):
        assert pg.GainPE(ramp(4), 0.5).render(0, 4).data.dtype == np.float32

    def test_chain_of_gains(self):
        pe = pg.GainPE(pg.GainPE(ramp(4), 2.0), 0.25)
        np.testing.assert_allclose(
            pe.render(0, 4).data[:, 0], [0, 0.5, 1.0, 1.5]
        )

    def test_mono_gain_broadcasts_over_stereo(self):
        out = pg.GainPE(ramp(4, ch=2), pg.ConstantPE(0.5)).render(0, 4).data
        np.testing.assert_allclose(out[:, 1], 2 * out[:, 0])


# ---- SinePE --------------------------------------------------------------


class TestSineMicro:
    def test_infinite_extent_and_purity(self):
        pe = pg.SinePE(frequency=440.0)
        e = pe.extent()
        assert e.start is None and e.end is None and pe.is_pure()

    def test_amplitude_scales(self):
        a = pg.SinePE(frequency=441.0, amplitude=0.25).render(0, 200).data
        b = pg.SinePE(frequency=441.0).render(0, 200).data
        np.testing.assert_allclose(a, 0.25 * b, atol=1e-6)

    def test_phase_offset_pi_inverts(self):
        a = pg.SinePE(frequency=441.0, phase=np.pi).render(0, 200).data
        b = pg.SinePE(frequency=441.0).render(0, 200).data
        np.testing.assert_allclose(a, -b, atol=1e-5)

    def test_channels_replicate(self):
        out = pg.SinePE(frequency=441.0, channels=3).render(0, 64).data
        assert out.shape == (64, 3)
        np.testing.assert_allclose(out[:, 0], out[:, 2])

    def test_frequency_cycles_per_second(self):
        # 441 Hz at 44100 -> period exactly 100 samples
        out = pg.SinePE(frequency=441.0).render(0, 300).data[:, 0]
        np.testing.assert_allclose(out[:100], out[100:200], atol=1e-4)

    def test_render_window_independence(self):
        pe = pg.SinePE(frequency=440.0)
        whole = pe.render(0, 256).data
        part = pe.render(128, 128).data
        np.testing.assert_allclose(whole[128:], part, atol=1e-5)

    def test_pe_frequency_vibrato_bounded(self):
        lfo = pg.PiecewisePE([(0, 400.0), (SR, 500.0)])
        out = pg.SinePE(frequency=lfo, amplitude=1.0).render(0, SR // 10).data
        assert np.abs(out).max() <= 1.0 + 1e-6

    def test_negative_start_defined(self):
        out = pg.SinePE(frequency=440.0).render(-100, 100).data
        assert np.isfinite(out).all()


# ---- MixPE ---------------------------------------------------------------


class TestMixMicro:
    def test_sums_constants(self):
        out = pg.MixPE(
            [pg.ConstantPE(0.25), pg.ConstantPE(0.5)]
        ).render(0, 4).data
        np.testing.assert_allclose(out, 0.75)

    def test_extent_union(self):
        a = pg.CropPE(pg.ConstantPE(1.0), 0, 4)
        b = pg.CropPE(pg.ConstantPE(1.0), 8, 4)
        assert pg.MixPE([a, b]).extent() == Extent(0, 12)

    def test_gap_between_sources_is_silent(self):
        a = pg.CropPE(pg.ConstantPE(1.0), 0, 2)
        b = pg.CropPE(pg.ConstantPE(1.0), 4, 2)
        out = pg.MixPE([a, b]).render(0, 6).data[:, 0]
        np.testing.assert_allclose(out, [1, 1, 0, 0, 1, 1])

    def test_three_way_mix(self):
        pes = [pg.ConstantPE(v) for v in (0.1, 0.2, 0.3)]
        out = pg.MixPE(pes).render(0, 4).data
        np.testing.assert_allclose(out, 0.6, atol=1e-6)

    def test_purity_follows_inputs(self):
        assert pg.MixPE([ramp(), ramp()]).is_pure()

    def test_inputs_order_preserved(self):
        a, b = ramp(), ramp()
        assert pg.MixPE([a, b]).inputs() == [a, b]

    def test_stereo_mix(self):
        out = pg.MixPE([ramp(4, ch=2), ramp(4, ch=2)]).render(0, 4).data
        np.testing.assert_allclose(out[:, 1], [0, 4, 8, 12])
