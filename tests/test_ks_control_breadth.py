"""KarplusStrongPE / ControlPE behavior breadth.

Mirrors reference tests/test_karplus_strong_pe.py:22-230 and
test_control_pe.py:20-170 beyond test_physical_lookup.py's
kernel-parity core: construction validation, rho decay formula laws,
stream continuity, and ControlPE's thread-safe live value.
"""

import threading

import numpy as np
import pytest

from pygmu2_tpu import ControlPE, KarplusStrongPE
from pygmu2_tpu.models.physical import rho_for_decay_db
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


class TestKarplusStrongBasics:
    def test_create_defaults(self):
        pe = KarplusStrongPE(220.0)
        assert pe.frequency == 220.0
        assert pe.rho == 0.996

    def test_create_with_all_params(self):
        pe = KarplusStrongPE(
            330.0, rho=0.99, duration=SR, rho_damping=0.9,
            amplitude=0.5, seed=3, channels=2,
        )
        assert pe.frequency == 330.0
        assert pe.rho == 0.99
        assert pe.channel_count() == 2

    def test_invalid_frequency(self):
        with pytest.raises(ValueError, match="frequency"):
            KarplusStrongPE(0.0)

    def test_invalid_rho(self):
        with pytest.raises(ValueError, match="rho"):
            KarplusStrongPE(220.0, rho=1.5)

    def test_invalid_amplitude(self):
        with pytest.raises(ValueError, match="amplitude"):
            KarplusStrongPE(220.0, amplitude=0.0)

    def test_invalid_two_phase_duration(self):
        with pytest.raises(ValueError, match="duration"):
            KarplusStrongPE(220.0, duration=-5, rho_damping=0.9)

    def test_invalid_rho_damping(self):
        with pytest.raises(ValueError, match="rho_damping"):
            KarplusStrongPE(220.0, duration=100, rho_damping=2.0)

    def test_extent_half_infinite(self):
        ext = KarplusStrongPE(220.0).extent()
        assert ext.start == 0 and ext.end is None

    def test_inputs_empty(self):
        assert KarplusStrongPE(220.0).inputs() == []

    def test_is_impure(self):
        assert KarplusStrongPE(220.0).is_pure() is False

    def test_repr(self):
        assert "KarplusStrongPE" in repr(KarplusStrongPE(220.0))


class TestKarplusStrongRender:
    def test_render_nonsilent_and_bounded(self):
        d = np.asarray(KarplusStrongPE(220.0, seed=1).render(0, 4096).data)
        assert np.abs(d).max() > 0.01
        assert np.abs(d).max() <= 1.0

    def test_render_stereo_shape(self):
        d = np.asarray(
            KarplusStrongPE(220.0, seed=1, channels=2).render(0, 512).data
        )
        assert d.shape == (512, 2)

    def test_contiguous_renders_extend_stream(self):
        whole = np.asarray(KarplusStrongPE(220.0, seed=2).render(0, 2048).data)
        pe = KarplusStrongPE(220.0, seed=2)
        a = np.asarray(pe.render(0, 1024).data)
        b = np.asarray(pe.render(1024, 1024).data)
        np.testing.assert_allclose(
            np.concatenate([a, b]), whole, atol=1e-5
        )

    def test_negative_start_zeros(self):
        d = np.asarray(KarplusStrongPE(220.0, seed=1).render(-512, 512).data)
        np.testing.assert_array_equal(d, 0.0)

    def test_seed_reproducibility(self):
        a = np.asarray(KarplusStrongPE(220.0, seed=9).render(0, 1024).data)
        b = np.asarray(KarplusStrongPE(220.0, seed=9).render(0, 1024).data)
        np.testing.assert_array_equal(a, b)

    def test_different_seeds_differ(self):
        a = np.asarray(KarplusStrongPE(220.0, seed=1).render(0, 1024).data)
        b = np.asarray(KarplusStrongPE(220.0, seed=2).render(0, 1024).data)
        assert np.abs(a - b).max() > 1e-3

    def test_fundamental_frequency(self):
        # the noise fill can put most energy in a harmonic, so detect
        # pitch by autocorrelation (period peak), not spectral argmax
        d = np.asarray(KarplusStrongPE(441.0, seed=4).render(0, 8192).data)[:, 0]
        ac = np.correlate(d, d, mode="full")[d.size - 1 :]
        lag = 50 + int(np.argmax(ac[50:200]))  # search 220-880 Hz
        assert SR / lag == pytest.approx(441.0, abs=10)

    def test_high_rho_sustains_longer(self):
        tail = slice(3 * SR // 4, SR)

        def tail_energy(rho):
            d = np.asarray(
                KarplusStrongPE(220.0, rho=rho, seed=5).render(0, SR).data
            )[:, 0]
            return float(np.sqrt(np.mean(d[tail] ** 2)))

        assert tail_energy(0.999) > 5 * tail_energy(0.95)


class TestRhoForDecayDb:
    def test_returns_gain_below_one(self):
        rho = rho_for_decay_db(1.0, 220.0, SR)
        assert 0.9 < rho <= 1.0

    def test_longer_decay_needs_higher_rho(self):
        assert rho_for_decay_db(2.0, 220.0, SR) > rho_for_decay_db(0.5, 220.0, SR)

    def test_clamped_to_one(self):
        assert rho_for_decay_db(1000.0, 220.0, SR) == 1.0

    def test_empirical_decay_matches_target(self):
        # rho for -60 dB over 0.5 s: measure the actual envelope drop
        rho = rho_for_decay_db(0.5, 441.0, SR, db=-60.0)
        d = np.asarray(
            KarplusStrongPE(441.0, rho=rho, seed=6).render(0, SR // 2).data
        )[:, 0]
        head = np.sqrt(np.mean(d[: SR // 50] ** 2))
        tail = np.sqrt(np.mean(d[-SR // 50 :] ** 2))
        drop_db = 20 * np.log10(tail / head)
        assert drop_db == pytest.approx(-60.0, abs=12.0)


class TestControlPEBreadth:
    def test_create_default(self):
        pe = ControlPE()
        assert pe.value == 0.0

    def test_create_with_initial_value(self):
        assert ControlPE(initial_value=0.7).value == 0.7

    def test_create_with_channels(self):
        assert ControlPE(channels=2).channel_count() == 2

    def test_infinite_extent(self):
        ext = ControlPE().extent()
        assert ext.start is None and ext.end is None

    def test_is_impure(self):
        assert ControlPE().is_pure() is False

    def test_no_inputs(self):
        assert ControlPE().inputs() == []

    def test_repr(self):
        assert "ControlPE" in repr(ControlPE(initial_value=0.5))

    def test_render_initial_value(self):
        d = np.asarray(ControlPE(initial_value=0.25).render(0, 64).data)
        np.testing.assert_allclose(d, 0.25, atol=1e-6)

    def test_render_after_set_value(self):
        pe = ControlPE(initial_value=0.0)
        np.asarray(pe.render(0, 64).data)  # first block at initial
        pe.set_value(0.9)
        d = np.asarray(pe.render(64, 64).data)
        np.testing.assert_allclose(d, 0.9, atol=1e-6)

    def test_set_value_multiple_times_keeps_latest(self):
        pe = ControlPE()
        pe.set_value(0.1)
        pe.set_value(0.2)
        pe.set_value(0.3)
        d = np.asarray(pe.render(0, 16).data)
        np.testing.assert_allclose(d, 0.3, atol=1e-6)

    def test_value_persists_across_renders(self):
        pe = ControlPE()
        pe.set_value(0.4)
        np.asarray(pe.render(0, 32).data)
        d = np.asarray(pe.render(32, 32).data)
        np.testing.assert_allclose(d, 0.4, atol=1e-6)

    def test_render_stereo(self):
        pe = ControlPE(initial_value=0.6, channels=2)
        d = np.asarray(pe.render(0, 16).data)
        assert d.shape == (16, 2)
        np.testing.assert_allclose(d, 0.6, atol=1e-6)

    def test_render_negative_value(self):
        pe = ControlPE()
        pe.set_value(-0.8)
        d = np.asarray(pe.render(0, 16).data)
        np.testing.assert_allclose(d, -0.8, atol=1e-6)

    def test_set_value_from_thread(self):
        pe = ControlPE(initial_value=0.0)
        np.asarray(pe.render(0, 16).data)

        t = threading.Thread(target=pe.set_value, args=(0.77,))
        t.start()
        t.join()
        d = np.asarray(pe.render(16, 16).data)
        np.testing.assert_allclose(d, 0.77, atol=1e-6)
