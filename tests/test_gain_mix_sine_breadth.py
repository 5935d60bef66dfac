"""GainPE / MixPE / SinePE behavior breadth + extent/snippet extras.

Mirrors reference tests/test_gain_pe.py:*, test_mix_pe.py:*,
test_sine_pe.py:* basics and the extent/snippet micro-cases
(tests/test_extent.py, test_snippet.py) beyond the repo's algebra core.
"""

import numpy as np
import pytest

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    GainPE,
    IdentityPE,
    MixPE,
    SinePE,
)
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.snippet import Snippet
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


class TestGainPEBreadth:
    def test_gain_property_scalar(self):
        assert GainPE(ConstantPE(1.0), 0.5).gain == 0.5

    def test_gain_property_pe(self):
        g = ConstantPE(0.5)
        pe = GainPE(ConstantPE(1.0), g)
        assert pe.gain is g

    def test_default_gain_is_unity(self):
        pe = GainPE(ConstantPE(0.7))
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 8).data), 0.7, atol=1e-6
        )

    def test_inputs_scalar_gain(self):
        src = ConstantPE(1.0)
        assert GainPE(src, 0.5).inputs() == [src]

    def test_inputs_pe_gain(self):
        src, g = ConstantPE(1.0), ConstantPE(0.5)
        assert GainPE(src, g).inputs() == [src, g]

    def test_is_pure(self):
        assert GainPE(ConstantPE(1.0), 0.5).is_pure() is True

    def test_channel_count_passthrough(self):
        assert GainPE(ConstantPE(1.0, channels=2), 0.5).channel_count() == 2

    def test_extent_from_source_scalar_gain(self):
        src = ArrayPE(np.ones(50, np.float32))
        assert GainPE(src, 0.5).extent() == Extent(0, 50)

    def test_repr(self):
        assert "GainPE" in repr(GainPE(ConstantPE(1.0), 0.5))

    def test_zero_gain_silences(self):
        d = np.asarray(GainPE(SinePE(frequency=440.0), 0.0).render(0, 64).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_negative_gain_inverts(self):
        src = ArrayPE(np.arange(8, dtype=np.float32))
        d = np.asarray(GainPE(src, -1.0).render(0, 8).data)[:, 0]
        np.testing.assert_array_equal(d, -np.arange(8, dtype=np.float32))

    def test_gain_above_unity_amplifies(self):
        d = np.asarray(GainPE(ConstantPE(0.25), 4.0).render(0, 8).data)
        np.testing.assert_allclose(d, 1.0, atol=1e-6)

    def test_time_varying_gain(self):
        ramp = ArrayPE(np.linspace(0, 1, 100, dtype=np.float32))
        d = np.asarray(GainPE(ConstantPE(2.0), ramp).render(0, 100).data)[:, 0]
        np.testing.assert_allclose(
            d, 2.0 * np.linspace(0, 1, 100), atol=1e-5
        )

    def test_chained_gains_multiply(self):
        pe = GainPE(GainPE(ConstantPE(1.0), 0.5), 0.5)
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 8).data), 0.25, atol=1e-6
        )

    def test_stereo_gain(self):
        data = np.column_stack([np.ones(8), 2 * np.ones(8)]).astype(np.float32)
        d = np.asarray(GainPE(ArrayPE(data), 0.5).render(0, 8).data)
        np.testing.assert_allclose(d[:, 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(d[:, 1], 1.0, atol=1e-6)


class TestMixPEBreadth:
    def test_two_inputs_sum(self):
        d = np.asarray(
            MixPE(ConstantPE(0.25), ConstantPE(0.5)).render(0, 8).data
        )
        np.testing.assert_allclose(d, 0.75, atol=1e-6)

    def test_three_inputs_sum(self):
        d = np.asarray(
            MixPE(ConstantPE(0.1), ConstantPE(0.2), ConstantPE(0.3))
            .render(0, 8).data
        )
        np.testing.assert_allclose(d, 0.6, atol=1e-6)

    def test_inputs_listed_in_order(self):
        a, b = ConstantPE(0.1), ConstantPE(0.2)
        assert MixPE(a, b).inputs() == [a, b]

    def test_is_pure(self):
        assert MixPE(ConstantPE(0.1), ConstantPE(0.2)).is_pure() is True

    def test_channel_count_from_first(self):
        stereo = ConstantPE(0.1, channels=2)
        assert MixPE(stereo, ConstantPE(0.2, channels=2)).channel_count() == 2

    def test_extent_is_union(self):
        a = CropPE(ConstantPE(1.0), 0, 50)
        b = CropPE(ConstantPE(1.0), 100, 50)
        assert MixPE(a, b).extent() == Extent(0, 150)

    def test_disjoint_segments_mix_to_timeline(self):
        a = CropPE(ConstantPE(1.0), 0, 50)
        b = CropPE(ConstantPE(2.0), 100, 50)
        d = np.asarray(MixPE(a, b).render(0, 150).data)[:, 0]
        np.testing.assert_allclose(d[:50], 1.0, atol=1e-6)
        np.testing.assert_allclose(d[50:100], 0.0, atol=1e-6)
        np.testing.assert_allclose(d[100:], 2.0, atol=1e-6)

    def test_repr(self):
        assert "MixPE" in repr(MixPE(ConstantPE(0.1), ConstantPE(0.2)))

    def test_cancellation(self):
        src = SinePE(frequency=440.0)
        d = np.asarray(MixPE(src, GainPE(src, -1.0)).render(0, 128).data)
        np.testing.assert_allclose(d, 0.0, atol=1e-6)

    def test_stereo_mix(self):
        a = ConstantPE(0.25, channels=2)
        b = ConstantPE(0.25, channels=2)
        d = np.asarray(MixPE(a, b).render(0, 8).data)
        assert d.shape == (8, 2)
        np.testing.assert_allclose(d, 0.5, atol=1e-6)


class TestSinePEBreadth:
    def test_properties(self):
        pe = SinePE(frequency=220.0, amplitude=0.5, phase=0.25)
        assert pe.frequency == 220.0
        assert pe.amplitude == 0.5
        assert pe.initial_phase == 0.25

    def test_pure_with_constant_params(self):
        assert SinePE(frequency=440.0).is_pure() is True

    def test_modulated_is_impure(self):
        assert SinePE(frequency=ConstantPE(440.0)).is_pure() is False

    def test_infinite_extent(self):
        ext = SinePE(frequency=440.0).extent()
        assert ext.start is None and ext.end is None

    def test_matches_analytic_sine(self):
        pe = SinePE(frequency=441.0, amplitude=0.5)
        d = np.asarray(pe.render(0, 1000).data)[:, 0]
        expect = 0.5 * np.sin(2 * np.pi * 441.0 * np.arange(1000) / SR)
        np.testing.assert_allclose(d, expect, atol=1e-5)

    def test_phase_offset_shifts_waveform(self):
        # phase is in radians: pi/2 turns sine into cosine
        q = SinePE(frequency=441.0, phase=np.pi / 2)
        d = np.asarray(q.render(0, 1000).data)[:, 0]
        expect = np.cos(2 * np.pi * 441.0 * np.arange(1000) / SR)
        np.testing.assert_allclose(d, expect, atol=1e-5)

    def test_amplitude_scales(self):
        loud = np.asarray(SinePE(frequency=441.0, amplitude=1.0).render(0, 500).data)
        soft = np.asarray(SinePE(frequency=441.0, amplitude=0.1).render(0, 500).data)
        np.testing.assert_allclose(soft, loud * 0.1, atol=1e-6)

    def test_random_access_matches_streaming(self):
        pe = SinePE(frequency=441.0)
        whole = np.asarray(pe.render(0, 2000).data)
        window = np.asarray(pe.render(1000, 500).data)
        np.testing.assert_allclose(window, whole[1000:1500], atol=1e-6)

    def test_frequency_zero_is_dc(self):
        pe = SinePE(frequency=0.0, phase=np.pi / 2)
        d = np.asarray(pe.render(0, 100).data)[:, 0]
        np.testing.assert_allclose(d, 1.0, atol=1e-6)

    def test_negative_start_defined(self):
        pe = SinePE(frequency=441.0)
        d = np.asarray(pe.render(-500, 100).data)[:, 0]
        expect = np.sin(2 * np.pi * 441.0 * np.arange(-500, -400) / SR)
        np.testing.assert_allclose(d, expect, atol=1e-5)

    def test_multichannel(self):
        d = np.asarray(SinePE(frequency=441.0, channels=2).render(0, 64).data)
        assert d.shape == (64, 2)
        np.testing.assert_array_equal(d[:, 0], d[:, 1])

    def test_fm_with_pe_frequency_tracks_carrier(self):
        pe = SinePE(frequency=ConstantPE(441.0))
        d = np.asarray(pe.render(0, 2000).data)[:, 0]
        freqs = np.fft.rfftfreq(2000, 1 / SR)
        peak = freqs[np.argmax(np.abs(np.fft.rfft(d * np.hanning(2000))))]
        assert peak == pytest.approx(441.0, abs=25)


class TestExtentExtras:
    def test_union_disjoint_spans_gap(self):
        assert Extent(0, 10).union(Extent(90, 100)) == Extent(0, 100)

    def test_union_with_infinite(self):
        u = Extent(0, 10).union(Extent(None, None))
        assert u.start is None and u.end is None

    def test_intersection_contained(self):
        assert Extent(0, 100).intersection(Extent(25, 75)) == Extent(25, 75)

    def test_intersection_half_open(self):
        r = Extent(None, 100).intersection(Extent(50, None))
        assert r == Extent(50, 100)

    def test_duration_finite(self):
        e = Extent(10, 25)
        assert (e.end - e.start) == 15

    def test_empty_extent_not_contains(self):
        e = Extent(5, 5)
        assert e.is_empty()
        assert not e.contains(5)

    def test_negative_bounds(self):
        e = Extent(-100, -50)
        assert e.contains(-75)
        assert not e.contains(-50)  # half-open upper bound


class TestSnippetExtras:
    def test_start_and_duration(self):
        s = Snippet(10, np.zeros((32, 2), np.float32))
        assert s.start == 10
        assert s.duration == 32
        assert s.channels == 2

    def test_end_is_start_plus_duration(self):
        s = Snippet(10, np.zeros((32, 1), np.float32))
        assert s.start + s.duration == 42

    def test_data_shape_preserved(self):
        data = np.random.default_rng(0).standard_normal((16, 3)).astype(np.float32)
        s = Snippet(0, data)
        np.testing.assert_array_equal(np.asarray(s.data), data)

    def test_int_data_normalized_to_float32(self):
        s = Snippet(0, np.array([1, 2, 3]))
        assert np.asarray(s.data).dtype == np.float32
