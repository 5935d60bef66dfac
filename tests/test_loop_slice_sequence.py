"""LoopPE / SlicePE / SequencePE oracle tests."""

import numpy as np
import pytest

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    Extent,
    IdentityPE,
    LoopPE,
    SequenceMode,
    SequencePE,
    SinePE,
    SlicePE,
)

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)


class TestLoop:
    def test_infinite_loop_of_array(self):
        pe = LoopPE(ArrayPE([1.0, 2.0, 3.0]))
        assert pe.extent() == Extent(0, None)
        s = pe.render(0, 7)
        np.testing.assert_allclose(s.data[:, 0], [1, 2, 3, 1, 2, 3, 1])

    def test_counted_loop_extent_and_zero_after(self):
        pe = LoopPE(ArrayPE([1.0, 2.0]), count=3)
        assert pe.extent() == Extent(0, 6)
        s = pe.render(0, 8)
        np.testing.assert_allclose(s.data[:, 0], [1, 2, 1, 2, 1, 2, 0, 0])

    def test_loop_region(self):
        pe = LoopPE(IdentityPE(), loop_start=10, loop_end=13)
        s = pe.render(0, 6)
        np.testing.assert_allclose(s.data[:, 0], [10, 11, 12, 10, 11, 12])

    def test_infinite_source_without_end_raises(self):
        with pytest.raises(ValueError):
            LoopPE(ConstantPE(1.0))

    def test_crossfade_blend_formula(self):
        # Reference algorithm (loop_pe.py:211-241): in the last xf samples
        # of each pass, out = loop[pos]·(1−f) + loop[pos−(L−xf)]·f.
        data = np.linspace(0.0, 1.0, 100, dtype=np.float32)
        pe = LoopPE(ArrayPE(data), crossfade_seconds=10.0 / 44100.0)
        xf = pe.crossfade_samples
        assert xf == 10
        s = pe.render(0, 200)
        L = 100
        expect = data[np.arange(200) % L].copy()
        for i in range(200):
            pos = i % L
            fp = pos - (L - xf)
            if fp >= 0:
                f = fp / xf
                expect[i] = data[pos] * (1 - f) + data[fp] * f
        np.testing.assert_allclose(s.data[:, 0], expect, atol=1e-6)


class TestSlice:
    def test_reanchors_to_zero(self):
        pe = SlicePE(IdentityPE(), 100, 10)
        assert pe.extent() == Extent(0, 10)
        s = pe.render(0, 10)
        np.testing.assert_allclose(s.data[:, 0], np.arange(100, 110))

    def test_fades(self):
        pe = SlicePE(
            ConstantPE(1.0),
            0,
            441,
            fade_in_seconds=0.001,
            fade_out_seconds=0.001,
        )
        s = pe.render(0, 441)
        assert pe.fade_in_samples == 44
        assert s.data[0, 0] < 0.05
        assert s.data[-1, 0] < 0.05
        np.testing.assert_allclose(s.data[100:300, 0], 1.0)


    def test_negative_duration_raises(self):
        with pytest.raises(ValueError):
            SlicePE(IdentityPE(), 0, -5)


class TestSequence:
    def test_explicit_starts_overlap_mix(self):
        a = ArrayPE([1.0, 1.0, 1.0, 1.0])
        b = ArrayPE([10.0, 10.0, 10.0, 10.0])
        seq = SequencePE((a, 0), (b, 2))
        s = seq.render(0, 6)
        np.testing.assert_allclose(s.data[:, 0], [1, 1, 11, 11, 10, 10])

    def test_auto_advance(self):
        a = ArrayPE([1.0, 1.0])
        b = ArrayPE([2.0, 2.0])
        seq = SequencePE([(a, None), (b, None)])
        s = seq.render(0, 4)
        np.testing.assert_allclose(s.data[:, 0], [1, 1, 2, 2])
        assert seq.extent() == Extent(0, 4)

    def test_non_overlap_crops(self):
        a = ArrayPE([1.0] * 6)
        b = ArrayPE([2.0] * 2)
        seq = SequencePE((a, 0), (b, 3), mode=SequenceMode.NON_OVERLAP)
        s = seq.render(0, 6)
        np.testing.assert_allclose(s.data[:, 0], [1, 1, 1, 2, 2, 0])

    def test_auto_after_infinite_raises(self):
        with pytest.raises(ValueError):
            SequencePE((ConstantPE(1.0), 0), (ArrayPE([1.0]), None))

    def test_requires_items(self):
        with pytest.raises(ValueError):
            SequencePE()
