"""DelayPE and PiecewisePE oracle tests."""

import numpy as np

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    DelayPE,
    ExtendMode,
    Extent,
    IdentityPE,
    PiecewisePE,
    SinePE,
    TransitionType,
)

import pytest

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)


class TestDelayInt:
    def test_shift(self):
        d = DelayPE(IdentityPE(), 100)
        s = d.render(100, 3)
        np.testing.assert_allclose(s.data[:, 0], [0, 1, 2])

    def test_extent_shift(self):
        d = DelayPE(CropPE(IdentityPE(), 0, 10), 5)
        assert d.extent() == Extent(5, 15)

    def test_echo_graph(self):
        from pygmu2_tpu import GainPE, MixPE

        src = ArrayPE([1.0, 0, 0, 0, 0, 0])
        echo = MixPE(src, GainPE(DelayPE(src, 2), 0.5))
        s = echo.render(0, 6)
        np.testing.assert_allclose(s.data[:, 0], [1, 0, 0.5, 0, 0, 0])


class TestDelayFloat:
    def test_half_sample_linear(self):
        d = DelayPE(IdentityPE(), 0.5)
        s = d.render(10, 4)
        # linear interp of the ramp: value = t - 0.5
        np.testing.assert_allclose(s.data[:, 0], [9.5, 10.5, 11.5, 12.5], atol=1e-4)

    def test_extent_float(self):
        d = DelayPE(CropPE(IdentityPE(), 0, 10), 2.5)
        assert d.extent() == Extent(2, 13)

    def test_oob_zeroed(self):
        src = ArrayPE([1.0, 1.0, 1.0, 1.0])
        d = DelayPE(src, 1.5)
        s = d.render(0, 8)
        # valid lookups need index in [0, 3]: outputs at t in [1.5, 4.5]
        assert s.data[0, 0] == 0.0  # index -1.5
        assert s.data[7, 0] == 0.0  # index 5.5


class TestDelayPE_Modulated:
    def test_constant_pe_delay_matches_int(self):
        src = SinePE(frequency=441.0)
        dpe = DelayPE(src, ConstantPE(10.0), max_delay=32)
        ref = DelayPE(src, 10)
        a = dpe.render(100, 200).data
        b = ref.render(100, 200).data
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_variable_delay_ramp(self):
        # delay(t) = t/2 on a ramp source → out = t - t/2 = t/2
        src = IdentityPE()
        half = PiecewisePE([(0, 0.0), (1000, 500.0)])
        d = DelayPE(src, half, max_delay=600)
        s = d.render(100, 100)
        t = np.arange(100, 200, dtype=np.float64)
        np.testing.assert_allclose(s.data[:, 0], (t / 2).astype(np.float32), atol=1e-2)


class TestPiecewise:
    def test_linear_ramp(self):
        pw = PiecewisePE([(0, 0.0), (100, 1.0)])
        s = pw.render(0, 100)

        np.testing.assert_allclose(
            s.data[:, 0], np.arange(100) / 100.0, atol=1e-6
        )

    def test_extent_zero_mode(self):
        pw = PiecewisePE([(10, 0.0), (20, 1.0)])
        assert pw.extent() == Extent(10, 20)

    def test_single_point(self):
        pw = PiecewisePE([(5, 0.7)])
        assert pw.extent() == Extent(5, 6)
        s = pw.render(0, 10)
        np.testing.assert_allclose(s.data[5, 0], 0.7)
        assert abs(s.data[4, 0]) == 0.0

    def test_step(self):
        pw = PiecewisePE(
            [(0, 1.0), (4, 2.0), (8, 3.0)], transition_type=TransitionType.STEP
        )
        s = pw.render(0, 8)
        np.testing.assert_allclose(s.data[:, 0], [1, 1, 1, 1, 2, 2, 2, 2])

    def test_hold_modes_extend(self):
        pw = PiecewisePE(
            [(0, 0.0), (10, 1.0)], extend_mode=ExtendMode.HOLD_BOTH
        )
        assert pw.extent() == Extent(None, None)
        s = pw.render(-5, 25)
        np.testing.assert_allclose(s.data[:5, 0], 0.0)
        np.testing.assert_allclose(s.data[15:, 0], 1.0)

    def test_exponential_positive(self):
        pw = PiecewisePE(
            [(0, 1.0), (10, 100.0)], transition_type=TransitionType.EXPONENTIAL
        )
        s = pw.render(0, 10)
        np.testing.assert_allclose(
            s.data[:, 0], (100.0 ** (np.arange(10) / 10.0)).astype(np.float32), rtol=1e-5
        )

    def test_constant_power_crossfade_sums_to_unit_power(self):
        up = PiecewisePE([(0, 0.0), (100, 1.0)], transition_type=TransitionType.CONSTANT_POWER)
        down = PiecewisePE([(0, 1.0), (100, 0.0)], transition_type=TransitionType.CONSTANT_POWER)
        a = up.render(0, 100).data[:, 0]
        b = down.render(0, 100).data[:, 0]
        np.testing.assert_allclose(a**2 + b**2, 1.0, atol=1e-5)

    def test_duplicate_times_later_wins(self):
        pw = PiecewisePE(
            [(0, 1.0), (0, 5.0), (10, 5.0)], transition_type=TransitionType.STEP
        )
        s = pw.render(0, 5)
        np.testing.assert_allclose(s.data[:, 0], 5.0)
