"""Extent algebra contract tests (mirrors reference tests/test_extent.py)."""

import pytest

from pygmu2_tpu import Extent


class TestConstruction:
    def test_finite(self):
        e = Extent(10, 20)
        assert e.start == 10
        assert e.end == 20
        assert e.duration == 10

    def test_infinite(self):
        e = Extent(None, None)
        assert e.start is None
        assert e.end is None
        assert e.duration is None

    def test_half_open_bounds(self):
        assert Extent(None, 5).duration is None
        assert Extent(5, None).duration is None

    def test_empty_allowed(self):
        e = Extent(7, 7)
        assert e.is_empty()
        assert e.duration == 0

    def test_invalid_order_raises(self):
        with pytest.raises(ValueError):
            Extent(10, 5)


class TestPredicates:
    def test_contains(self):
        e = Extent(0, 10)
        assert e.contains(0)
        assert e.contains(9)
        assert not e.contains(10)
        assert not e.contains(-1)

    def test_contains_infinite(self):
        assert Extent(None, None).contains(-(10**12))
        assert Extent(None, 5).contains(-100)
        assert not Extent(None, 5).contains(5)
        assert Extent(5, None).contains(10**12)

    def test_spans(self):
        e = Extent(0, 100)
        assert e.spans(0, 100)
        assert e.spans(10, 50)
        assert not e.spans(-1, 5)
        assert not e.spans(90, 20)
        assert e.spans(500, 0)  # zero-duration always spans

    def test_intersects(self):
        assert Extent(0, 10).intersects(Extent(5, 15))
        assert not Extent(0, 10).intersects(Extent(10, 20))  # half-open
        assert Extent(None, None).intersects(Extent(5, 6))

    def test_empty_never_intersects(self):
        empty = Extent(5, 5)
        assert not empty.intersects(Extent(0, 10))
        assert not Extent(0, 10).intersects(empty)
        assert not empty.intersects(empty)


class TestAlgebra:
    def test_intersection_overlap(self):
        assert Extent(0, 10).intersection(Extent(5, 15)) == Extent(5, 10)

    def test_intersection_infinite(self):
        assert Extent(None, None).intersection(Extent(3, 9)) == Extent(3, 9)
        assert Extent(None, 10).intersection(Extent(5, None)) == Extent(5, 10)

    def test_intersection_disjoint_is_empty_at_boundary(self):
        result = Extent(0, 10).intersection(Extent(20, 30))
        assert result.is_empty()
        assert result.start == result.end == 20

    def test_intersection_with_empty(self):
        empty = Extent(5, 5)
        assert Extent(0, 10).intersection(empty).is_empty()
        assert empty.intersection(Extent(0, 10)).is_empty()

    def test_union(self):
        assert Extent(0, 10).union(Extent(20, 30)) == Extent(0, 30)
        assert Extent(0, 10).union(Extent(None, 5)) == Extent(None, 10)
        assert Extent(0, 10).union(Extent(5, None)) == Extent(0, None)

    def test_union_ignores_empty(self):
        empty = Extent(99, 99)
        assert Extent(0, 10).union(empty) == Extent(0, 10)
        assert empty.union(Extent(0, 10)) == Extent(0, 10)

    def test_empty_falsy(self):
        assert not Extent(5, 5)
        assert Extent(5, 6)
        assert Extent(None, None)
        # The fall-back idiom the reference documents:
        ext = Extent(0, 10)
        result = ext.intersection(Extent(20, 30)) or ext
        assert result == ext

    def test_equality_and_repr(self):
        assert Extent(1, 2) == Extent(1, 2)
        assert Extent(1, 2) != Extent(1, 3)
        assert "Extent" in repr(Extent(None, 5))
