"""SlewLimiterPE / AdsrGatedPE / EnvelopePE behavior breadth.

Mirrors reference tests/test_slew_limiter_pe.py:21-230,
test_adsr_pe.py:29-480, test_envelope_pe.py:25-360 beyond the
parity/kernel checks in test_control_pes.py / test_adsr_pallas.py:
construction surfaces, per-stage ramp laws, early-release and
retrigger behaviors, follower attack/release shape, and lookahead.
"""

import numpy as np
import pytest

from pygmu2_tpu import (
    AdsrGatedPE,
    ArrayPE,
    ConstantPE,
    EnvelopePE,
    SinePE,
    SlewLimiterPE,
)
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.models.modes import DetectionMode, SlewMode
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


def gate_signal(spans, n):
    """0/1 gate that is high over each [start, end) span."""
    g = np.zeros(n, np.float32)
    for s, e in spans:
        g[s:e] = 1.0
    return ArrayPE(g)


class TestSlewLimiterBreadth:
    def test_symmetric_rates_default(self):
        pe = SlewLimiterPE(ConstantPE(1.0), rise_rate=10.0)
        assert pe.rise_rate == 10.0 and pe.fall_rate == 10.0

    def test_asymmetric_rates(self):
        pe = SlewLimiterPE(ConstantPE(1.0), rise_rate=10.0, fall_rate=2.0)
        assert pe.rise_rate == 10.0 and pe.fall_rate == 2.0

    def test_default_mode_is_linear(self):
        assert SlewLimiterPE(ConstantPE(1.0), 10.0).mode == SlewMode.LINEAR

    def test_exponential_mode(self):
        pe = SlewLimiterPE(ConstantPE(1.0), 10.0, mode=SlewMode.EXPONENTIAL)
        assert pe.mode == SlewMode.EXPONENTIAL

    def test_is_not_pure(self):
        assert SlewLimiterPE(ConstantPE(1.0), 10.0).is_pure() is False

    def test_channel_count_is_one(self):
        assert SlewLimiterPE(ConstantPE(1.0), 10.0).channel_count() == 1

    def test_inputs_exposes_source(self):
        src = ConstantPE(1.0)
        assert SlewLimiterPE(src, 10.0).inputs() == [src]

    def test_repr(self):
        r = repr(SlewLimiterPE(ConstantPE(1.0), 10.0, fall_rate=5.0))
        assert "SlewLimiterPE" in r

    def test_step_up_at_limited_rate(self):
        # rate 44100 units/s == 1 unit/sample: a unit step takes 1 sample
        pe = SlewLimiterPE(ConstantPE(1.0), rise_rate=SR / 100.0)
        d = np.asarray(pe.render(0, 200).data)[:, 0]
        # 1/100 units per sample → reaches 1.0 at sample 100
        np.testing.assert_allclose(d[:100], (np.arange(100) + 1) / 100, atol=1e-5)
        np.testing.assert_allclose(d[100:], 1.0, atol=1e-5)

    def test_step_down_at_limited_rate(self):
        src = ArrayPE(np.concatenate(
            [np.ones(10), np.zeros(200)]).astype(np.float32))
        pe = SlewLimiterPE(src, rise_rate=SR, fall_rate=SR / 100.0)
        d = np.asarray(pe.render(0, 210).data)[:, 0]
        assert d[9] == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(
            d[10:110], 1.0 - (np.arange(100) + 1) / 100, atol=1e-5
        )

    def test_reaches_target_and_stays(self):
        pe = SlewLimiterPE(ConstantPE(0.5), rise_rate=SR)
        d = np.asarray(pe.render(0, 50).data)[:, 0]
        np.testing.assert_allclose(d[5:], 0.5, atol=1e-6)

    def test_state_persists_across_contiguous_renders(self):
        def make():
            return SlewLimiterPE(ConstantPE(1.0), rise_rate=SR / 1000.0)

        whole = np.asarray(make().render(0, 400).data)[:, 0]
        pe = make()
        parts = np.concatenate([
            np.asarray(pe.render(0, 200).data)[:, 0],
            np.asarray(pe.render(200, 200).data)[:, 0],
        ])
        np.testing.assert_allclose(parts, whole, atol=1e-6)

    def test_exponential_rises_toward_target_never_exceeds(self):
        pe = SlewLimiterPE(
            ConstantPE(1.0), rise_rate=100.0, mode=SlewMode.EXPONENTIAL
        )
        d = np.asarray(pe.render(0, 2000).data)[:, 0]
        assert np.all(np.diff(d) >= -1e-7)  # monotone rise
        assert np.all(d <= 1.0 + 1e-6)      # never overshoots
        assert d[-1] > d[100]                # still approaching

    def test_slew_smooths_stepped_signal(self):
        steps = ArrayPE(
            np.repeat([0.0, 1.0, 0.2, 0.8], 100).astype(np.float32)
        )
        pe = SlewLimiterPE(steps, rise_rate=SR / 50.0)
        d = np.asarray(pe.render(0, 400).data)[:, 0]
        assert np.abs(np.diff(d)).max() <= 1.0 / 50 + 1e-6


class TestAdsrGatedBreadth:
    def test_create_default(self):
        pe = AdsrGatedPE(ConstantPE(1.0))
        assert pe.inputs()[0] is not None

    def test_is_not_pure(self):
        assert AdsrGatedPE(ConstantPE(1.0)).is_pure() is False

    def test_channel_count_is_one(self):
        assert AdsrGatedPE(ConstantPE(1.0)).channel_count() == 1

    def test_extent_matches_gate(self):
        gate = gate_signal([(0, 500)], 1000)
        assert AdsrGatedPE(gate).extent() == Extent(0, 1000)

    def test_extent_infinite_gate(self):
        ext = AdsrGatedPE(ConstantPE(1.0)).extent()
        assert ext.start is None and ext.end is None

    def test_idle_before_gate(self):
        gate = gate_signal([(500, 900)], 1000)
        d = np.asarray(AdsrGatedPE(gate).render(0, 500).data)[:, 0]
        np.testing.assert_array_equal(d, 0.0)

    def test_complete_cycle(self):
        # A=10ms D=10ms S=0.5 R=10ms; gate high 0..1323 (30ms)
        a = int(0.01 * SR)
        gate = gate_signal([(0, 3 * a)], 6 * a)
        pe = AdsrGatedPE(gate, attack_time=0.01, decay_time=0.01,
                         sustain_level=0.5, release_time=0.01)
        d = np.asarray(pe.render(0, 6 * a).data)[:, 0]
        assert d[a - 1] == pytest.approx(1.0, abs=0.01)        # attack peak
        assert d[2 * a - 1] == pytest.approx(0.5, abs=0.01)    # decay → sustain
        assert d[3 * a - 2] == pytest.approx(0.5, abs=0.01)    # sustain holds
        assert d[4 * a] == pytest.approx(0.0, abs=0.01)        # released
        np.testing.assert_allclose(d[4 * a + 2 :], 0.0, atol=1e-5)

    def test_precise_attack_ramp(self):
        a = int(0.01 * SR)
        gate = gate_signal([(0, 4 * a)], 4 * a)
        pe = AdsrGatedPE(gate, attack_time=0.01, decay_time=0.01,
                         sustain_level=0.5, release_time=0.01)
        d = np.asarray(pe.render(0, a).data)[:, 0]
        # the rising-edge sample outputs 0 (stage flips, env accumulates
        # from the next sample) — ramp is k/a, not (k+1)/a
        np.testing.assert_allclose(d, np.arange(a) / a, atol=2e-3)

    def test_sustain_holds_until_gate_falls(self):
        a = int(0.01 * SR)
        gate = gate_signal([(0, 10 * a)], 10 * a)
        pe = AdsrGatedPE(gate, attack_time=0.01, decay_time=0.01,
                         sustain_level=0.37, release_time=0.01)
        d = np.asarray(pe.render(0, 10 * a).data)[:, 0]
        np.testing.assert_allclose(d[3 * a : 10 * a - 1], 0.37, atol=0.01)

    def test_early_release_during_attack(self):
        # gate drops at 1/4 of the attack: release starts from there
        a = int(0.04 * SR)
        gate = gate_signal([(0, a // 4)], a)
        pe = AdsrGatedPE(gate, attack_time=0.04, decay_time=0.01,
                         sustain_level=0.5, release_time=0.001)
        d = np.asarray(pe.render(0, a).data)[:, 0]
        peak = d.max()
        assert 0.1 < peak < 0.5  # never reached full scale
        np.testing.assert_allclose(d[a // 4 + 200 :], 0.0, atol=1e-4)

    def test_retrigger_during_release(self):
        a = int(0.01 * SR)
        gate = gate_signal([(0, 2 * a), (2 * a + a // 2, 6 * a)], 6 * a)
        pe = AdsrGatedPE(gate, attack_time=0.01, decay_time=0.01,
                         sustain_level=0.5, release_time=0.02)
        d = np.asarray(pe.render(0, 6 * a).data)[:, 0]
        # second rising edge mid-release: envelope climbs again to peak
        assert d[2 * a + a // 2 :].max() == pytest.approx(1.0, abs=0.02)

    def test_zero_sustain_level(self):
        a = int(0.01 * SR)
        gate = gate_signal([(0, 4 * a)], 4 * a)
        pe = AdsrGatedPE(gate, attack_time=0.01, decay_time=0.01,
                         sustain_level=0.0, release_time=0.01)
        d = np.asarray(pe.render(0, 4 * a).data)[:, 0]
        np.testing.assert_allclose(d[int(2.2 * a) :], 0.0, atol=0.01)

    def test_unit_sustain_level(self):
        a = int(0.01 * SR)
        gate = gate_signal([(0, 4 * a)], 4 * a)
        pe = AdsrGatedPE(gate, attack_time=0.01, decay_time=0.01,
                         sustain_level=1.0, release_time=0.01)
        d = np.asarray(pe.render(0, 4 * a).data)[:, 0]
        np.testing.assert_allclose(d[a : 4 * a - 1], 1.0, atol=0.01)

    def test_rapid_gate_changes_stay_bounded(self):
        g = (np.arange(2000) // 50 % 2).astype(np.float32)
        pe = AdsrGatedPE(ArrayPE(g), attack_time=0.002, decay_time=0.002,
                         sustain_level=0.5, release_time=0.002)
        d = np.asarray(pe.render(0, 2000).data)[:, 0]
        assert np.all(d >= -1e-6) and np.all(d <= 1.0 + 1e-6)

    def test_chunked_matches_oneshot(self):
        a = int(0.01 * SR)

        def make():
            gate = gate_signal([(0, 3 * a)], 6 * a)
            return AdsrGatedPE(gate, attack_time=0.01, decay_time=0.01,
                               sustain_level=0.5, release_time=0.01)

        whole = np.asarray(make().render(0, 6 * a).data)[:, 0]
        pe = make()
        parts = np.concatenate([
            np.asarray(pe.render(s, a).data)[:, 0]
            for s in range(0, 6 * a, a)
        ])
        np.testing.assert_allclose(parts, whole, atol=1e-5)


class TestEnvelopePEBreadth:
    def test_create_default(self):
        pe = EnvelopePE(ConstantPE(1.0))
        assert pe.attack == 0.01
        assert pe.release == 0.1
        assert pe.lookahead == 0.0
        assert pe.mode == DetectionMode.PEAK

    def test_create_with_params(self):
        pe = EnvelopePE(ConstantPE(1.0), attack=0.005, release=0.2,
                        lookahead=0.001, mode=DetectionMode.RMS)
        assert pe.attack == 0.005 and pe.release == 0.2
        assert pe.lookahead == 0.001
        assert pe.mode == DetectionMode.RMS

    def test_lookahead_clamped_to_attack(self):
        pe = EnvelopePE(ConstantPE(1.0), attack=0.01, lookahead=0.5)
        assert pe.lookahead == 0.01

    def test_negative_values_clamped(self):
        pe = EnvelopePE(ConstantPE(1.0), attack=-1.0, release=-2.0,
                        lookahead=-3.0)
        assert pe.attack == 0.0 and pe.release == 0.0 and pe.lookahead == 0.0

    def test_inputs(self):
        src = ConstantPE(1.0)
        assert EnvelopePE(src).inputs() == [src]

    def test_is_not_pure(self):
        assert EnvelopePE(ConstantPE(1.0)).is_pure() is False

    def test_channel_count_passthrough(self):
        assert EnvelopePE(ConstantPE(1.0, channels=2)).channel_count() == 2

    def test_extent_from_source(self):
        src = ArrayPE(np.zeros(256, np.float32))
        assert EnvelopePE(src).extent() == Extent(0, 256)

    def test_repr(self):
        r = repr(EnvelopePE(ConstantPE(1.0), attack=0.02))
        assert "EnvelopePE" in r and "0.02" in r and "peak" in r

    def test_constant_input_reaches_unity(self):
        pe = EnvelopePE(ConstantPE(1.0), attack=0.005)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert d[-1] == pytest.approx(1.0, abs=0.01)

    def test_envelope_is_positive_for_bipolar_input(self):
        pe = EnvelopePE(SinePE(frequency=441.0), attack=0.005, release=0.02)
        d = np.asarray(pe.render(1000, 4096).data)[:, 0]
        assert np.all(d >= 0.0)
        assert d.mean() > 0.3  # tracks the rectified sine level

    def test_attack_rises_monotonically(self):
        step = ArrayPE(np.concatenate(
            [np.zeros(100), np.ones(2000)]).astype(np.float32))
        pe = EnvelopePE(step, attack=0.01, release=0.1)
        d = np.asarray(pe.render(0, 2100).data)[:, 0]
        seg = d[100:500]
        assert np.all(np.diff(seg) >= -1e-7)
        assert seg[-1] > 0.5

    def test_release_falls_after_signal_stops(self):
        burst = ArrayPE(np.concatenate(
            [np.ones(1000), np.zeros(4000)]).astype(np.float32))
        pe = EnvelopePE(burst, attack=0.001, release=0.01)
        d = np.asarray(pe.render(0, 5000).data)[:, 0]
        assert d[999] == pytest.approx(1.0, abs=0.05)
        assert d[1999] < 0.2          # decayed within ~2.3 time constants
        assert d[1000] > d[1500] > d[2000]  # monotone fall

    def test_lookahead_anticipates_transient(self):
        hit = np.zeros(2000, np.float32)
        hit[1000:] = 1.0
        look = EnvelopePE(ArrayPE(hit), attack=0.005, lookahead=0.005)
        flat = EnvelopePE(ArrayPE(hit), attack=0.005, lookahead=0.0)
        dl = np.asarray(look.render(0, 2000).data)[:, 0]
        df = np.asarray(flat.render(0, 2000).data)[:, 0]
        # with lookahead the envelope is already rising BEFORE the hit
        assert dl[950] > df[950] + 0.1

    def test_rms_mode_smoother_than_peak(self):
        noise = ArrayPE(
            (np.random.default_rng(0).standard_normal(4096) * 0.5)
            .astype(np.float32)
        )
        peak = EnvelopePE(noise, attack=0.001, release=0.005,
                          mode=DetectionMode.PEAK)
        rms = EnvelopePE(noise, attack=0.001, release=0.005,
                         mode=DetectionMode.RMS)
        dp = np.asarray(peak.render(0, 4096).data)[2000:, 0]
        dr = np.asarray(rms.render(0, 4096).data)[2000:, 0]
        assert dr.std() < dp.std()

    def test_stereo_independent_channels(self):
        left = np.concatenate([np.ones(500), np.zeros(1500)])
        right = np.concatenate([np.zeros(1500), np.ones(500)])
        src = ArrayPE(np.column_stack([left, right]).astype(np.float32))
        pe = EnvelopePE(src, attack=0.001, release=0.005)
        d = np.asarray(pe.render(0, 2000).data)
        assert d[400, 0] > 0.9 and d[400, 1] < 0.1
        assert d[1900, 1] > 0.9 and d[1900, 0] < 0.1

    def test_state_persists_across_contiguous_renders(self):
        def make():
            burst = ArrayPE(np.concatenate(
                [np.ones(1000), np.zeros(1000)]).astype(np.float32))
            return EnvelopePE(burst, attack=0.002, release=0.02)

        whole = np.asarray(make().render(0, 2000).data)[:, 0]
        pe = make()
        parts = np.concatenate([
            np.asarray(pe.render(0, 1000).data)[:, 0],
            np.asarray(pe.render(1000, 1000).data)[:, 0],
        ])
        np.testing.assert_allclose(parts, whole, atol=1e-5)
