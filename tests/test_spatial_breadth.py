"""SpatialPE / pan-law / SpatialAdapter / KEMAR-selection breadth.

Mirrors reference tests/test_spatial_pe.py:29-480 beyond
test_effects_spatial.py's parity core: exact pan gains at the canonical
azimuths, clamping, mono-mix-first, adapter channel matrix, SpatialPE
surface, and HRTF file selection laws.
"""

import numpy as np
import pytest

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    SpatialAdapter,
    SpatialConstantPower,
    SpatialHRTF,
    SpatialLinear,
    SpatialMethod,
    SpatialPE,
)
from pygmu2_tpu.core.extent import Extent
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


def pan_gains(method_cls, azimuth, level=1.0):
    pe = SpatialPE(ConstantPE(level), method=method_cls(azimuth))
    d = np.asarray(pe.render(0, 8).data)
    return float(d[0, 0]), float(d[0, 1])


class TestSpatialLinearPan:
    def test_center_pan_azimuth_0(self):
        l, r = pan_gains(SpatialLinear, 0.0)
        assert l == pytest.approx(0.5, abs=1e-6)
        assert r == pytest.approx(0.5, abs=1e-6)

    def test_right_pan_azimuth_90(self):
        l, r = pan_gains(SpatialLinear, 90.0)
        assert l == pytest.approx(0.0, abs=1e-6)
        assert r == pytest.approx(1.0, abs=1e-6)

    def test_left_pan_azimuth_neg90(self):
        l, r = pan_gains(SpatialLinear, -90.0)
        assert l == pytest.approx(1.0, abs=1e-6)
        assert r == pytest.approx(0.0, abs=1e-6)

    def test_partial_right_pan_azimuth_45(self):
        l, r = pan_gains(SpatialLinear, 45.0)
        assert l == pytest.approx(0.25, abs=1e-6)
        assert r == pytest.approx(0.75, abs=1e-6)

    def test_azimuth_clamped_past_range(self):
        assert pan_gains(SpatialLinear, 450.0) == pan_gains(SpatialLinear, 90.0)
        assert pan_gains(SpatialLinear, -450.0) == pan_gains(SpatialLinear, -90.0)

    def test_stereo_input_mixed_to_mono_first(self):
        stereo = ArrayPE(
            np.column_stack([np.full(8, 0.2), np.full(8, 0.8)]).astype(np.float32)
        )
        pe = SpatialPE(stereo, method=SpatialLinear(0.0))
        d = np.asarray(pe.render(0, 8).data)
        # mono mix = 0.5, center pan splits 0.25/0.25
        np.testing.assert_allclose(d, 0.25, atol=1e-6)


class TestSpatialConstantPowerPan:
    def test_center_pan_equal_gains_unit_power(self):
        l, r = pan_gains(SpatialConstantPower, 0.0)
        assert l == pytest.approx(r, abs=1e-6)
        assert l**2 + r**2 == pytest.approx(1.0, abs=1e-5)

    def test_right_pan_azimuth_90(self):
        l, r = pan_gains(SpatialConstantPower, 90.0)
        assert l == pytest.approx(0.0, abs=1e-6)
        assert r == pytest.approx(1.0, abs=1e-6)

    def test_left_pan_azimuth_neg90(self):
        l, r = pan_gains(SpatialConstantPower, -90.0)
        assert l == pytest.approx(1.0, abs=1e-6)
        assert r == pytest.approx(0.0, abs=1e-6)

    def test_power_constant_across_azimuths(self):
        for az in (-90, -60, -30, 0, 30, 60, 90):
            l, r = pan_gains(SpatialConstantPower, float(az))
            assert l**2 + r**2 == pytest.approx(1.0, abs=1e-5), az

    def test_partial_right_louder_than_linear(self):
        lc, rc = pan_gains(SpatialConstantPower, 45.0)
        ll, rl = pan_gains(SpatialLinear, 45.0)
        # constant power keeps more total energy off-center
        assert lc**2 + rc**2 > ll**2 + rl**2


class TestSpatialAdapterMatrix:
    def _adapt(self, data, channels):
        pe = SpatialPE(
            ArrayPE(np.asarray(data, np.float32)),
            method=SpatialAdapter(channels=channels),
        )
        return np.asarray(pe.render(0, len(data)).data)

    def test_mono_to_stereo_copies(self):
        d = self._adapt(np.ones((4, 1)), 2)
        assert d.shape == (4, 2)
        np.testing.assert_allclose(d, 1.0, atol=1e-6)

    def test_stereo_to_mono_averages(self):
        d = self._adapt(np.column_stack([np.ones(4), np.zeros(4)]), 1)
        np.testing.assert_allclose(d[:, 0], 0.5, atol=1e-6)

    def test_mono_to_quad(self):
        d = self._adapt(np.ones((4, 1)), 4)
        assert d.shape == (4, 4)
        np.testing.assert_allclose(d, 1.0, atol=1e-6)

    def test_quad_to_stereo(self):
        quad = np.column_stack(
            [np.full(4, 1.0), np.full(4, 0.0), np.full(4, 1.0), np.full(4, 0.0)]
        )
        d = self._adapt(quad, 2)
        assert d.shape == (4, 2)
        assert np.isfinite(d).all()

    def test_same_channel_count_identity(self):
        data = np.column_stack([np.arange(4), -np.arange(4)])
        d = self._adapt(data, 2)
        np.testing.assert_allclose(d, data, atol=1e-6)

    def test_channel_count_property(self):
        pe = SpatialPE(ConstantPE(1.0), method=SpatialAdapter(channels=4))
        assert pe.channel_count() == 4


class TestSpatialPESurface:
    def test_method_required(self):
        with pytest.raises((TypeError, ValueError)):
            SpatialPE(ConstantPE(1.0), method=None)

    def test_method_type_checked(self):
        with pytest.raises((TypeError, ValueError)):
            SpatialPE(ConstantPE(1.0), method="linear")

    def test_inputs_include_source(self):
        src = ConstantPE(1.0)
        pe = SpatialPE(src, method=SpatialLinear(0.0))
        assert src in pe.inputs()

    def test_inputs_include_dynamic_azimuth(self):
        az = ConstantPE(45.0)
        pe = SpatialPE(ConstantPE(1.0), method=SpatialLinear(az))
        assert az in pe.inputs()

    def test_extent_passthrough_for_pan(self):
        src = ArrayPE(np.ones(64, np.float32))
        pe = SpatialPE(src, method=SpatialLinear(0.0))
        assert pe.extent() == Extent(0, 64)

    def test_channel_count_is_method_output(self):
        pe = SpatialPE(ConstantPE(1.0), method=SpatialConstantPower(0.0))
        assert pe.channel_count() == 2

    def test_static_pan_is_pure(self):
        pe = SpatialPE(ConstantPE(1.0), method=SpatialLinear(0.0))
        assert pe.is_pure() is True

    def test_repr_mentions_method(self):
        r = repr(SpatialPE(ConstantPE(1.0), method=SpatialLinear(30.0)))
        assert "SpatialPE" in r

    def test_pan_method_repr(self):
        assert "SpatialLinear(azimuth=30.0)" == repr(SpatialLinear(30.0))

    def test_modulated_azimuth_sweeps(self):
        az = ArrayPE(np.linspace(-90, 90, 100).astype(np.float32))
        pe = SpatialPE(ConstantPE(1.0), method=SpatialConstantPower(az))
        d = np.asarray(pe.render(0, 100).data)
        assert d[0, 0] == pytest.approx(1.0, abs=1e-3)   # hard left
        assert d[-1, 1] == pytest.approx(1.0, abs=1e-3)  # hard right
        np.testing.assert_allclose(
            (d**2).sum(axis=1), 1.0, atol=1e-4
        )  # power constant during the sweep


class TestKemarSelection:
    def test_front_returns_zero_azimuth_file(self):
        f = SpatialHRTF.hrtf_filename_for(0.0, 0.0)
        assert "000" in f

    def test_45_right_file(self):
        f = SpatialHRTF.hrtf_filename_for(45.0, 0.0)
        assert "045" in f

    def test_45_left_mirrors_right(self):
        assert SpatialHRTF.hrtf_filename_for(-45.0, 0.0) == (
            SpatialHRTF.hrtf_filename_for(45.0, 0.0)
        )

    def test_90_right_file(self):
        f = SpatialHRTF.hrtf_filename_for(90.0, 0.0)
        assert "090" in f

    def test_elevation_affects_choice(self):
        low = SpatialHRTF.hrtf_filename_for(0.0, 0.0)
        high = SpatialHRTF.hrtf_filename_for(0.0, 40.0)
        assert low != high

    def test_returns_string_from_entries(self):
        f = SpatialHRTF.hrtf_filename_for(10.0, 0.0)
        assert isinstance(f, str) and f.endswith(".wav")

    def test_rejects_dynamic_azimuth(self):
        with pytest.raises(ValueError, match="static"):
            SpatialHRTF(ConstantPE(0.0))

    def test_rejects_dynamic_elevation(self):
        with pytest.raises(ValueError, match="static"):
            SpatialHRTF(0.0, elevation=ConstantPE(0.0))

    def test_accepts_static_int(self):
        assert SpatialHRTF(45, elevation=10).azimuth == 45.0

    def test_ir_rate_mismatch_strict_raises(self):
        import pygmu2_tpu as pg

        pg.set_sample_rate(48000)  # KEMAR IRs are 44100
        try:
            pe = SpatialPE(ConstantPE(1.0), method=SpatialHRTF(0.0))
            with pytest.raises(RuntimeError, match="KEMAR IR rate"):
                pe.render(0, 64)
        finally:
            pg.set_sample_rate(44100)

    def test_ir_rate_mismatch_lenient_warns_once(self, caplog):
        import pygmu2_tpu as pg
        from pygmu2_tpu.core.config import ErrorMode, set_error_mode

        pg.set_sample_rate(48000)
        set_error_mode(ErrorMode.LENIENT)
        try:
            pe = SpatialPE(ConstantPE(1.0), method=SpatialHRTF(0.0))
            with caplog.at_level("WARNING"):
                d = np.asarray(pe.render(0, 64).data)  # continues
            assert np.isfinite(d).all()
            assert "KEMAR IR rate" in caplog.text
        finally:
            set_error_mode(ErrorMode.STRICT)
            pg.set_sample_rate(44100)
