"""IdentityPE / DiracPE analytical-signal coverage.

Mirrors reference tests/test_analytical_pe.py:20-260: creation,
purity, extent, channels, exact index/impulse values across window
placements, and their canonical use for verifying delays.
"""

import numpy as np
import pytest

from pygmu2_tpu import DelayPE, DiracPE, IdentityPE
from pygmu2_tpu.core.extent import Extent


class TestIdentityPEBasics:
    def test_create_default_mono(self):
        assert IdentityPE().channel_count() == 1

    def test_create_with_channels(self):
        assert IdentityPE(channels=3).channel_count() == 3

    def test_is_pure(self):
        assert IdentityPE().is_pure() is True

    def test_no_inputs(self):
        assert IdentityPE().inputs() == []

    def test_extent_infinite(self):
        ext = IdentityPE().extent()
        assert ext.start is None and ext.end is None

    def test_repr(self):
        assert repr(IdentityPE(channels=2)) == "IdentityPE(channels=2)"


class TestIdentityPERender:
    def test_render_from_zero(self):
        s = IdentityPE().render(0, 10)
        np.testing.assert_array_equal(
            np.asarray(s.data)[:, 0], np.arange(10, dtype=np.float32)
        )

    def test_render_from_positive(self):
        s = IdentityPE().render(1000, 5)
        np.testing.assert_array_equal(
            np.asarray(s.data)[:, 0], np.arange(1000, 1005, dtype=np.float32)
        )

    def test_render_from_negative(self):
        s = IdentityPE().render(-5, 10)
        np.testing.assert_array_equal(
            np.asarray(s.data)[:, 0], np.arange(-5, 5, dtype=np.float32)
        )

    def test_render_stereo_channels_equal(self):
        d = np.asarray(IdentityPE(channels=2).render(7, 4).data)
        np.testing.assert_array_equal(d[:, 0], d[:, 1])
        np.testing.assert_array_equal(d[:, 0], [7, 8, 9, 10])

    def test_render_large_indices_exact(self):
        # f32 holds integers exactly below 2^24
        s = IdentityPE().render(1_000_000, 4)
        np.testing.assert_array_equal(
            np.asarray(s.data)[:, 0], [1_000_000, 1_000_001, 1_000_002, 1_000_003]
        )

    def test_identity_verifies_delay_amount(self):
        delayed = DelayPE(IdentityPE(), delay=42)
        d = np.asarray(delayed.render(100, 8).data)[:, 0]
        # y[t] = x[t - 42] = t - 42
        np.testing.assert_array_equal(d, np.arange(100, 108) - 42.0)


class TestDiracPEBasics:
    def test_create_default_mono(self):
        assert DiracPE().channel_count() == 1

    def test_create_with_channels(self):
        assert DiracPE(channels=2).channel_count() == 2

    def test_is_pure(self):
        assert DiracPE().is_pure() is True

    def test_no_inputs(self):
        assert DiracPE().inputs() == []

    def test_extent_infinite(self):
        ext = DiracPE().extent()
        assert ext.start is None and ext.end is None

    def test_repr(self):
        assert repr(DiracPE()) == "DiracPE(channels=1)"


class TestDiracPERender:
    def test_window_including_zero(self):
        d = np.asarray(DiracPE().render(-3, 7).data)[:, 0]
        expected = np.zeros(7, np.float32)
        expected[3] = 1.0
        np.testing.assert_array_equal(d, expected)

    def test_window_from_zero(self):
        d = np.asarray(DiracPE().render(0, 5).data)[:, 0]
        np.testing.assert_array_equal(d, [1, 0, 0, 0, 0])

    def test_window_after_zero_all_zero(self):
        d = np.asarray(DiracPE().render(1, 5).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_window_before_zero_all_zero(self):
        d = np.asarray(DiracPE().render(-10, 5).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_window_ending_at_zero_excludes_impulse(self):
        # [-5, 0) excludes sample 0
        d = np.asarray(DiracPE().render(-5, 5).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_stereo_impulse_both_channels(self):
        d = np.asarray(DiracPE(channels=2).render(0, 3).data)
        np.testing.assert_array_equal(d[0], [1.0, 1.0])
        np.testing.assert_array_equal(d[1:], 0.0)

    def test_single_sample_at_zero(self):
        d = np.asarray(DiracPE().render(0, 1).data)
        np.testing.assert_array_equal(d, [[1.0]])

    def test_single_sample_not_at_zero(self):
        d = np.asarray(DiracPE().render(17, 1).data)
        np.testing.assert_array_equal(d, [[0.0]])

    def test_unit_energy(self):
        d = np.asarray(DiracPE().render(-100, 200).data)
        assert float(np.sum(d)) == 1.0
        assert float(np.sum(d**2)) == 1.0


class TestDiracPEWithDelay:
    def test_delayed_impulse_lands_at_delay(self):
        d = np.asarray(DelayPE(DiracPE(), delay=25).render(0, 40).data)[:, 0]
        expected = np.zeros(40, np.float32)
        expected[25] = 1.0
        np.testing.assert_array_equal(d, expected)

    def test_delayed_impulse_gone_from_origin(self):
        d = np.asarray(DelayPE(DiracPE(), delay=25).render(0, 10).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_impulse_probes_fir_response(self):
        # Rendering a Dirac through any LTI chain reads out its impulse
        # response: here the 2-tap chain x[t] + 0.5 x[t-3].
        from pygmu2_tpu import GainPE, MixPE

        chain = MixPE(DiracPE(), GainPE(DelayPE(DiracPE(), delay=3), 0.5))
        d = np.asarray(chain.render(0, 6).data)[:, 0]
        np.testing.assert_allclose(d, [1, 0, 0, 0.5, 0, 0], atol=1e-7)
