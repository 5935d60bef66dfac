"""Snippet contract tests (mirrors reference tests/test_snippet.py)."""

import numpy as np
import pytest

from pygmu2_tpu import Snippet


class TestSnippet:
    def test_mono_promotion(self):
        s = Snippet(0, np.array([1.0, 2.0, 3.0]))
        assert s.data.shape == (3, 1)
        assert s.channels == 1

    def test_2d(self):
        s = Snippet(5, np.zeros((4, 2)))
        assert s.start == 5
        assert s.end == 9
        assert s.duration == 4
        assert s.channels == 2

    def test_3d_raises(self):
        with pytest.raises(ValueError):
            Snippet(0, np.zeros((2, 2, 2)))

    def test_dtype_normalized_to_float32(self):
        s = Snippet(0, np.array([1, 2, 3], dtype=np.float64))
        assert s.data.dtype == np.float32
        s = Snippet(0, np.array([1, 2, 3], dtype=np.int32))
        assert s.data.dtype == np.float32

    def test_zero_length(self):
        s = Snippet(10, np.zeros((0, 2)))
        assert s.duration == 0
        assert s.end == 10

    def test_from_zeros(self):
        s = Snippet.from_zeros(3, 7, channels=2)
        assert s.start == 3
        assert s.duration == 7
        assert s.channels == 2
        assert not s.data.any()

    def test_equality_allclose(self):
        a = Snippet(0, np.array([1.0, 2.0]))
        b = Snippet(0, np.array([1.0, 2.0 + 1e-9]))
        c = Snippet(1, np.array([1.0, 2.0]))
        assert a == b
        assert a != c

    def test_repr(self):
        assert "Snippet" in repr(Snippet.from_zeros(0, 4))
