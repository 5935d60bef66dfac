"""Gates, triggers, ADSR, envelope follower, holds, slew, control."""

import numpy as np
import pytest

from pygmu2_tpu import (
    AdsrGatedPE,
    AdsrTriggeredPE,
    ArrayPE,
    CachePE,
    ConstantPE,
    ControlPE,
    DetectionMode,
    EnvelopePE,
    FunctionGenPE,
    GainPE,
    IdentityPE,
    MixPE,
    NoisePE,
    PeriodicGate,
    PeriodicTrigger,
    SampleHoldPE,
    SlewLimiterPE,
    SlewMode,
    TrackHoldPE,
)
from pygmu2_tpu.models.gates import GateSignal

SR = 44100


class SquareGate(GateSignal):
    """Test gate: 1 for [on, off), repeating with the given period."""

    def __init__(self, period: int, on: int):
        self._period = period
        self._on = on

    def inputs(self):
        return []

    def is_pure(self):
        return True

    def _trace_gate(self, ctx):
        import jax.numpy as jnp

        t = ctx.times()
        return (jnp.mod(t, self._period) < self._on).astype("float32")[:, None]


class TestGatesTriggers:
    def test_periodic_trigger_positions(self):
        trig = PeriodicTrigger(hz=4410.0)  # every 10 samples
        s = trig.render(0, 30)
        expect = np.zeros(30)
        expect[::10] = 1.0
        np.testing.assert_array_equal(s.data[:, 0], expect)

    def test_periodic_trigger_phase(self):
        trig = PeriodicTrigger(hz=4410.0, phase=0.5)
        s = trig.render(0, 20)
        assert s.data[5, 0] == 1.0

    def test_periodic_gate_duty(self):
        gate = PeriodicGate(frequency=441.0, duty_cycle=0.25)  # period 100
        s = gate.render(0, 100)
        assert set(np.unique(s.data)) <= {0.0, 1.0}
        np.testing.assert_allclose(s.data[:, 0].mean(), 0.25, atol=0.02)

    def test_gate_validation_rejects_bad_values(self):
        class BadGate(GateSignal):
            def inputs(self):
                return []

            def _trace_gate(self, ctx):
                import jax.numpy as jnp

                return jnp.full((ctx.duration, 1), 0.5)

        with pytest.raises(ValueError):
            BadGate().render(0, 16)


class TestFunctionGen:
    def test_rectangle_pure(self):
        fg = FunctionGenPE(frequency=441.0, duty_cycle=0.5)  # period 100
        s = fg.render(0, 100)
        np.testing.assert_allclose(s.data[:50, 0], 1.0)
        np.testing.assert_allclose(s.data[50:, 0], -1.0)

    def test_sawtooth_morph_triangle(self):
        fg = FunctionGenPE(frequency=441.0, duty_cycle=0.5, waveform="sawtooth")
        s = fg.render(0, 100)
        # triangle: -1 at phase 0, +1 at phase 0.5
        assert abs(s.data[0, 0] + 1.0) < 0.05
        assert abs(s.data[50, 0] - 1.0) < 0.05

    def test_bad_waveform_raises(self):
        with pytest.raises(ValueError):
            FunctionGenPE(waveform="sine")


class TestAdsr:
    def test_gated_stages(self):
        gate = SquareGate(period=4000, on=2000)
        adsr = AdsrGatedPE(
            gate,
            attack_time=100 / SR,
            decay_time=100 / SR,
            sustain_level=0.5,
            release_time=100 / SR,
        )
        s = adsr.render(0, 4000).data[:, 0]
        assert s[0] == 0.0
        np.testing.assert_allclose(s[105], 1.0, atol=0.05)  # attack peak
        np.testing.assert_allclose(s[300:1999], 0.5, atol=1e-5)  # sustain
        np.testing.assert_allclose(s[2150:], 0.0, atol=1e-5)  # released

    def test_gated_block_invariance(self):
        gate = SquareGate(period=1000, on=500)

        def fresh():
            return AdsrGatedPE(SquareGate(period=1000, on=500), 0.002, 0.002, 0.6, 0.002)

        one = fresh().render(0, 3000).data
        pe = fresh()
        parts = [pe.render(i * 750, 750).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)

    def test_triggered_cycle(self):
        trig = PeriodicTrigger(hz=SR / 4000)  # every 4000 samples
        adsr = AdsrTriggeredPE(
            trig,
            attack_time=100 / SR,
            decay_time=100 / SR,
            sustain_time=500 / SR,
            sustain_level=0.5,
            release_time=100 / SR,
        )
        s = adsr.render(0, 4000).data[:, 0]
        np.testing.assert_allclose(s[105], 1.0, atol=0.05)
        np.testing.assert_allclose(s[400], 0.5, atol=1e-5)  # sustaining
        np.testing.assert_allclose(s[1000:], 0.0, atol=1e-5)  # done


class TestEnvelope:
    def test_symmetric_matches_one_pole(self):
        sig = np.abs(np.random.default_rng(0).uniform(-1, 1, 2000)).astype(np.float32)
        pe = EnvelopePE(ArrayPE(sig), attack=0.01, release=0.01)
        y = pe.render(0, 2000).data[:, 0]
        coeff = 1.0 - np.exp(-1.0 / (0.01 * SR))
        env = 0.0
        expect = np.zeros(2000)
        for i, v in enumerate(np.abs(sig)):
            env = env + coeff * (v - env)
            expect[i] = env
        np.testing.assert_allclose(y, expect, atol=1e-5)

    def test_asymmetric_attack_release(self):
        step = np.zeros(2000, np.float32)
        step[:1000] = 1.0
        pe = EnvelopePE(ArrayPE(step), attack=0.001, release=0.05)
        y = pe.render(0, 2000).data[:, 0]
        assert y[200] > 0.95  # fast attack
        assert y[1100] > 0.5  # slow release keeps level up
        assert y[1999] < y[1100]

    def test_lookahead_shifts_detection(self):
        imp = np.zeros(500, np.float32)
        imp[250] = 1.0
        la = int(0.002 * SR)
        pe = EnvelopePE(ArrayPE(imp), attack=0.002, release=0.01, lookahead=0.002)
        y = pe.render(0, 500).data[:, 0]
        assert y[250 - la] > 0.0  # envelope rises before the transient

    def test_rms_mode_smooths(self):
        sig = np.sign(np.sin(np.arange(4000) * 0.5)).astype(np.float32)
        peak = EnvelopePE(ArrayPE(sig), attack=0.01, release=0.01).render(0, 4000)
        rms = EnvelopePE(
            ArrayPE(sig), attack=0.01, release=0.01, mode=DetectionMode.RMS
        ).render(0, 4000)
        assert np.isfinite(rms.data).all()
        assert rms.data[2000:, 0].std() <= peak.data[2000:, 0].std() + 1e-3


class TestHolds:
    def test_sample_hold_latches(self):
        src = IdentityPE()
        trig = PeriodicTrigger(hz=SR / 10)  # every 10 samples
        sh = SampleHoldPE(src, trig)
        y = sh.render(0, 30).data[:, 0]
        np.testing.assert_array_equal(y, np.repeat([0.0, 10.0, 20.0], 10))

    def test_sample_hold_initial_and_carry(self):
        src = IdentityPE()
        trig = PeriodicTrigger(hz=SR / 100)
        sh = SampleHoldPE(src, trig, initial_value=-7.0)
        a = sh.render(5, 20).data[:, 0]  # no trigger in [5, 25)
        np.testing.assert_array_equal(a, -7.0)
        b = sh.render(25, 100).data[:, 0]
        assert b[-1] == 100.0

    def test_track_hold(self):
        gate = SquareGate(period=20, on=10)
        th = TrackHoldPE(IdentityPE(), gate)
        y = th.render(0, 40).data[:, 0]
        np.testing.assert_array_equal(y[:10], np.arange(10))
        np.testing.assert_array_equal(y[10:20], 9.0)
        np.testing.assert_array_equal(y[20:30], np.arange(20, 30))


class TestSlew:
    def test_linear_ramp_rate(self):
        step = ConstantPE(1.0)
        pe = SlewLimiterPE(step, rise_rate=SR / 100.0)  # 0.01 per sample
        y = pe.render(0, 200).data[:, 0]
        np.testing.assert_allclose(y[:100], (np.arange(100) + 1) * 0.01, atol=1e-5)
        np.testing.assert_allclose(y[150], 1.0, atol=1e-5)

    def test_exponential_asymptotic(self):
        pe = SlewLimiterPE(
            ConstantPE(1.0), rise_rate=441.0, mode=SlewMode.EXPONENTIAL
        )
        y = pe.render(0, 1000).data[:, 0]
        assert 0 < y[0] < 0.05
        assert y[-1] < 1.0
        assert np.all(np.diff(y) >= -1e-7)

    def test_bad_rates(self):
        with pytest.raises(ValueError):
            SlewLimiterPE(ConstantPE(0.0), rise_rate=0.0)


class TestControlCache:
    def test_control_value_changes_between_blocks(self):
        ctl = ControlPE(initial_value=1.0)
        a = ctl.render(0, 10).data
        np.testing.assert_allclose(a, 1.0)
        ctl.set_value(2.5)
        b = ctl.render(10, 10).data
        np.testing.assert_allclose(b, 2.5)

    def test_cache_pe_legalizes_impure_fanout(self):
        from pygmu2_tpu.core.renderer import NullRenderer

        noise = NoisePE(seed=1)
        cached = CachePE(noise)
        graph = MixPE(GainPE(cached, 0.5), GainPE(cached, -0.5))
        r = NullRenderer()
        r.set_source(graph)  # must not raise
        s = graph.render(0, 100)
        np.testing.assert_allclose(s.data, 0.0, atol=1e-7)
