"""Analytical-oracle tests for basic sources and transforms
(mirrors the reference's per-PE test structure, CONTRIBUTING.md:419-457)."""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    DiracPE,
    ExtendMode,
    Extent,
    GainPE,
    IdentityPE,
    MixPE,
    SetExtentPE,
    SinePE,
    TransformPE,
)


class TestConstantPE:
    def test_value_and_channels(self):
        s = ConstantPE(0.25, channels=3).render(0, 10)
        assert s.channels == 3
        np.testing.assert_allclose(s.data, 0.25)

    def test_infinite_extent(self):
        e = ConstantPE(1.0).extent()
        assert e.start is None and e.end is None


class TestArrayPE:
    def test_playback(self):
        pe = ArrayPE([0.0, 0.5, 1.0, 0.5])
        s = pe.render(0, 4)
        np.testing.assert_allclose(s.data[:, 0], [0.0, 0.5, 1.0, 0.5])
        assert pe.extent() == Extent(0, 4)

    def test_zero_outside(self):
        pe = ArrayPE([1.0, 2.0])
        s = pe.render(-2, 6)
        np.testing.assert_allclose(s.data[:, 0], [0, 0, 1, 2, 0, 0])

    def test_hold_modes(self):
        pe = ArrayPE([3.0, 7.0], extend_mode=ExtendMode.HOLD_BOTH)
        s = pe.render(-2, 6)
        np.testing.assert_allclose(s.data[:, 0], [3, 3, 3, 7, 7, 7])

    def test_stereo(self):
        pe = ArrayPE([[1.0, -1.0], [0.5, -0.5]])
        s = pe.render(0, 2)
        np.testing.assert_allclose(s.data, [[1, -1], [0.5, -0.5]])

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            ArrayPE([])


class TestGainPE:
    def test_scalar_gain(self):
        s = GainPE(ConstantPE(0.5), 2.0).render(0, 5)
        np.testing.assert_allclose(s.data, 1.0)

    def test_pe_gain_broadcasts_mono_over_stereo(self):
        src = ConstantPE(1.0, channels=2)
        gain = IdentityPE()
        s = GainPE(src, gain).render(0, 4)
        np.testing.assert_allclose(s.data, [[0, 0], [1, 1], [2, 2], [3, 3]])

    def test_extent_intersection_with_pe_gain(self):
        src = CropPE(ConstantPE(1.0), 0, 100)
        gain = CropPE(ConstantPE(1.0), 50, 100)
        pe = GainPE(src, gain)
        assert pe.extent() == Extent(50, 100)


class TestMixPE:
    def test_sum(self):
        s = MixPE(ConstantPE(1.0), ConstantPE(2.0), ConstantPE(3.0)).render(0, 4)
        np.testing.assert_allclose(s.data, 6.0)

    def test_requires_two_inputs(self):
        with pytest.raises(ValueError):
            MixPE(ConstantPE(1.0))

    def test_list_form(self):
        s = MixPE([ConstantPE(1.0), ConstantPE(1.0)]).render(0, 2)
        np.testing.assert_allclose(s.data, 2.0)

    def test_union_extent(self):
        a = CropPE(ConstantPE(1.0), 0, 10)
        b = CropPE(ConstantPE(1.0), 20, 10)
        m = MixPE(a, b)
        assert m.extent() == Extent(0, 30)
        s = m.render(0, 30)
        np.testing.assert_allclose(s.data[0:10, 0], 1.0)
        np.testing.assert_allclose(s.data[10:20, 0], 0.0)
        np.testing.assert_allclose(s.data[20:30, 0], 1.0)


class TestCropSetExtent:
    def test_crop_window(self):
        s = CropPE(IdentityPE(), 5, 3).render(0, 10)
        np.testing.assert_allclose(s.data[:, 0], [0, 0, 0, 0, 0, 5, 6, 7, 0, 0])

    def test_crop_hold_last(self):
        s = CropPE(IdentityPE(), 0, 3, extend_mode=ExtendMode.HOLD_LAST).render(0, 6)
        np.testing.assert_allclose(s.data[:, 0], [0, 1, 2, 2, 2, 2])

    def test_crop_open_end(self):
        pe = CropPE(IdentityPE(), 10, None)
        assert pe.extent() == Extent(10, None)

    def test_set_extent_overrides_source(self):
        inner = CropPE(IdentityPE(), 0, 5)
        pe = SetExtentPE(inner, 0, 10)
        assert pe.extent() == Extent(0, 10)

    def test_negative_duration_raises(self):
        with pytest.raises(ValueError):
            CropPE(IdentityPE(), 0, -1)


class TestTransformPE:
    def test_elementwise(self):
        import jax.numpy as jnp

        s = TransformPE(ConstantPE(2.0), lambda x: jnp.tanh(x)).render(0, 3)
        np.testing.assert_allclose(s.data, np.tanh(2.0), rtol=1e-6)

    def test_preserves_extent(self):
        pe = TransformPE(CropPE(ConstantPE(1.0), 0, 7), lambda x: x * 2)
        assert pe.extent() == Extent(0, 7)


class TestSinePE:
    def test_pure_analytic(self):
        sr = 44100
        pe = SinePE(frequency=441.0, amplitude=0.5, phase=0.1)
        s = pe.render(0, 1000)
        t = np.arange(1000) / sr
        expect = 0.5 * np.sin(0.1 + 2 * np.pi * 441.0 * t)
        np.testing.assert_allclose(s.data[:, 0], expect.astype(np.float32), atol=1e-6)

    def test_pure_random_access_matches(self):
        pe = SinePE(frequency=1000.0)
        a = pe.render(44100, 128).data
        b = pe.render(0, 44100 + 128).data[44100:]
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_modulated_is_impure(self):
        lfo = SinePE(frequency=5.0)
        fm = SinePE(frequency=lfo)
        assert fm.is_pure() is False
        assert fm.inputs() == [lfo]

    def test_am_modulation(self):
        # Stateful path integrates frequency inclusively (phase[i] =
        # Σ_{k≤i} inc[k], reference sine_pe.py:217), hence t+1 below.
        env = ConstantPE(0.25)
        pe = SinePE(frequency=441.0, amplitude=env)
        s = pe.render(0, 500)
        expect = 0.25 * np.sin(2 * np.pi * 441.0 * (np.arange(500) + 1) / 44100)
        np.testing.assert_allclose(s.data[:, 0], expect.astype(np.float32), atol=1e-5)

    def test_fm_phase_continuity_across_blocks(self):
        # Chunked rendering must match a single render (state carry).
        def fresh():
            return SinePE(frequency=MixPE(ConstantPE(440.0), SinePE(frequency=2.0, amplitude=100.0)))

        one = fresh().render(0, 2000).data
        pe = fresh()
        parts = [pe.render(i * 500, 500).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-4)

    def test_disjoint_extent_params_empty(self):
        freq = CropPE(ConstantPE(440.0), 0, 10)
        amp = CropPE(ConstantPE(1.0), 20, 10)
        pe = SinePE(frequency=freq, amplitude=amp)
        assert pe.extent().is_empty()


class TestDiracIdentity:
    def test_dirac_convolution_identity(self):
        s = DiracPE().render(0, 8)
        assert s.data[0, 0] == 1.0
        assert not s.data[1:].any()

    def test_identity_negative(self):
        s = IdentityPE().render(-3, 3)
        np.testing.assert_allclose(s.data[:, 0], [-3, -2, -1])
