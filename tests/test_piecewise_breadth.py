"""PiecewisePE behavior breadth.

Mirrors reference tests/test_piecewise_pe.py:23-260 beyond the
transition-math checks in test_delay_piecewise.py: construction
surface, point sorting, per-extend-mode extents and renders, window
placements, stereo broadcast, and every transition type.
"""

import numpy as np
import pytest

from pygmu2_tpu import PiecewisePE
from pygmu2_tpu.core.extent import ExtendMode, Extent
from pygmu2_tpu.core.snippet import Snippet
from pygmu2_tpu.models.modes import TransitionType
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


class TestPiecewisePEBasics:
    def test_create_two_points(self):
        pe = PiecewisePE([(0, 0.0), (100, 1.0)])
        assert pe.points == [(0, 0.0), (100, 1.0)]
        assert pe.transition_type == TransitionType.LINEAR
        assert pe.extend_mode == ExtendMode.ZERO

    def test_create_single_point(self):
        pe = PiecewisePE([(50, 0.7)])
        assert pe.points == [(50, 0.7)]

    def test_points_sorted_by_time(self):
        pe = PiecewisePE([(100, 1.0), (0, 0.0), (50, 0.5)])
        assert pe.points == [(0, 0.0), (50, 0.5), (100, 1.0)]

    def test_create_with_channels(self):
        assert PiecewisePE([(0, 1.0)], channels=3).channel_count() == 3

    def test_transition_type_accepts_string(self):
        pe = PiecewisePE([(0, 0.0), (10, 1.0)], transition_type="sigmoid")
        assert pe.transition_type == TransitionType.SIGMOID

    def test_finite_extent_zero_mode(self):
        assert PiecewisePE([(10, 0.0), (110, 1.0)]).extent() == Extent(10, 110)

    def test_single_point_extent(self):
        assert PiecewisePE([(5, 1.0)]).extent() == Extent(5, 6)

    def test_infinite_extent_with_hold(self):
        ext = PiecewisePE(
            [(0, 0.0), (10, 1.0)], extend_mode=ExtendMode.HOLD_BOTH
        ).extent()
        assert ext.start is None and ext.end is None

    def test_is_pure(self):
        assert PiecewisePE([(0, 1.0)]).is_pure() is True

    def test_no_inputs(self):
        assert PiecewisePE([(0, 1.0)]).inputs() == []

    def test_empty_points_raises(self):
        with pytest.raises(ValueError):
            PiecewisePE([])

    def test_channels_must_be_positive(self):
        with pytest.raises(ValueError):
            PiecewisePE([(0, 1.0)], channels=0)

    def test_repr(self):
        r = repr(PiecewisePE([(0, 0.0), (10, 1.0)]))
        assert "PiecewisePE" in r


class TestPiecewisePERender:
    def test_render_returns_snippet(self):
        s = PiecewisePE([(0, 0.0), (100, 1.0)]).render(0, 50)
        assert isinstance(s, Snippet)
        assert s.start == 0 and s.duration == 50

    def test_linear_full_segment(self):
        d = np.asarray(
            PiecewisePE([(0, 0.0), (100, 1.0)]).render(0, 100).data
        )[:, 0]
        np.testing.assert_allclose(d, np.arange(100) / 100, atol=1e-5)

    def test_step_transition(self):
        pe = PiecewisePE(
            [(0, 0.2), (50, 0.8)], transition_type=TransitionType.STEP
        )
        d = np.asarray(pe.render(0, 50).data)[:, 0]
        np.testing.assert_allclose(d, 0.2, atol=1e-6)

    def test_single_point_renders_value_at_time(self):
        pe = PiecewisePE([(5, 0.7)])
        d = np.asarray(pe.render(5, 1).data)[:, 0]
        np.testing.assert_allclose(d, 0.7, atol=1e-6)

    def test_before_extent_zero_mode(self):
        pe = PiecewisePE([(100, 0.5), (200, 1.0)])
        d = np.asarray(pe.render(0, 50).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_after_extent_zero_mode(self):
        pe = PiecewisePE([(0, 0.5), (100, 1.0)])
        d = np.asarray(pe.render(150, 50).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_hold_first_before(self):
        pe = PiecewisePE(
            [(100, 0.5), (200, 1.0)], extend_mode=ExtendMode.HOLD_FIRST
        )
        d = np.asarray(pe.render(0, 50).data)[:, 0]
        np.testing.assert_allclose(d, 0.5, atol=1e-6)

    def test_hold_last_after(self):
        pe = PiecewisePE(
            [(0, 0.5), (100, 1.0)], extend_mode=ExtendMode.HOLD_LAST
        )
        d = np.asarray(pe.render(200, 50).data)[:, 0]
        np.testing.assert_allclose(d, 1.0, atol=1e-6)

    def test_hold_both_covers_both_sides(self):
        pe = PiecewisePE(
            [(100, 0.25), (200, 0.75)], extend_mode=ExtendMode.HOLD_BOTH
        )
        before = np.asarray(pe.render(0, 10).data)[:, 0]
        after = np.asarray(pe.render(300, 10).data)[:, 0]
        np.testing.assert_allclose(before, 0.25, atol=1e-6)
        np.testing.assert_allclose(after, 0.75, atol=1e-6)

    def test_partial_middle_window(self):
        pe = PiecewisePE([(0, 0.0), (1000, 1.0)])
        d = np.asarray(pe.render(400, 200).data)[:, 0]
        np.testing.assert_allclose(
            d, np.arange(400, 600) / 1000, atol=1e-5
        )

    def test_stereo_broadcasts_same_curve(self):
        pe = PiecewisePE([(0, 0.0), (100, 1.0)], channels=2)
        d = np.asarray(pe.render(0, 100).data)
        assert d.shape == (100, 2)
        np.testing.assert_array_equal(d[:, 0], d[:, 1])

    def test_multi_segment_knees(self):
        pe = PiecewisePE([(0, 0.0), (100, 1.0), (200, 0.5)])
        d = np.asarray(pe.render(0, 200).data)[:, 0]
        assert d[100] == pytest.approx(1.0, abs=0.02)
        assert d[150] == pytest.approx(0.75, abs=0.02)

    def test_exponential_transition_monotone_convex(self):
        pe = PiecewisePE(
            [(0, 0.01), (1000, 1.0)],
            transition_type=TransitionType.EXPONENTIAL,
        )
        d = np.asarray(pe.render(0, 1000).data)[:, 0]
        assert np.all(np.diff(d) > 0)
        assert d[500] < 0.5  # convex: below the linear chord

    def test_sigmoid_transition_s_shape(self):
        pe = PiecewisePE(
            [(0, 0.0), (1000, 1.0)], transition_type=TransitionType.SIGMOID
        )
        d = np.asarray(pe.render(0, 1000).data)[:, 0]
        assert d[500] == pytest.approx(0.5, abs=0.02)  # symmetric midpoint
        assert d[100] < 0.1 and d[900] > 0.9           # flat tails

    def test_constant_power_transition(self):
        pe = PiecewisePE(
            [(0, 0.0), (1000, 1.0)],
            transition_type=TransitionType.CONSTANT_POWER,
        )
        d = np.asarray(pe.render(0, 1000).data)[:, 0]
        # sin-based fade: sums to unit power with its complement
        comp = np.asarray(
            PiecewisePE(
                [(0, 1.0), (1000, 0.0)],
                transition_type=TransitionType.CONSTANT_POWER,
            ).render(0, 1000).data
        )[:, 0]
        np.testing.assert_allclose(d**2 + comp**2, 1.0, atol=1e-4)

    def test_render_is_repeatable(self):
        pe = PiecewisePE([(0, 0.0), (100, 1.0)])
        a = np.asarray(pe.render(0, 100).data)
        b = np.asarray(pe.render(0, 100).data)
        np.testing.assert_array_equal(a, b)
