"""Golden parity vs the reference: ADSR, sample/track hold, slew, loop.

These PEs had analytical tests but no reference-gated parity until now.
(reference: adsr_pe.py, sample_hold_pe.py, track_hold_pe.py,
slew_limiter_pe.py, loop_pe.py)"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from tests.ref_oracle import load_reference

ref = load_reference()

needs_ref = pytest.mark.skipif(ref is None, reason="reference not available")

SR = 44100


@pytest.fixture(autouse=True)
def _rates():
    pg.set_sample_rate(SR)
    if ref is not None:
        ref.set_sample_rate(SR)


def _render_pair(ours, theirs, start, duration, atol=1e-4):
    got = ours.render(start, duration).data
    want = theirs.render(start, duration).data
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol)


@needs_ref
class TestAdsrParity:
    def test_gated_full_cycle(self):
        # gate on for 0.2 s at 50 Hz period -> attack/decay/sustain/release
        kw = dict(
            attack_time=0.01, decay_time=0.05,
            sustain_level=0.4, release_time=0.08,
        )
        ours = pg.AdsrGatedPE(pg.PeriodicGate(frequency=4.0, duty_cycle=0.5), **kw)
        theirs = ref.AdsrGatedPE(
            ref.PeriodicGate(frequency=4.0, duty_cycle=0.5), **kw
        )
        _render_pair(ours, theirs, 0, SR // 2)

    def test_gated_chunked_matches_oneshot(self):
        kw = dict(attack_time=0.02, decay_time=0.03,
                  sustain_level=0.6, release_time=0.05)
        one = pg.AdsrGatedPE(pg.PeriodicGate(frequency=5.0, duty_cycle=0.4), **kw)
        full = one.render(0, 8192).data
        two = pg.AdsrGatedPE(pg.PeriodicGate(frequency=5.0, duty_cycle=0.4), **kw)
        parts = np.concatenate(
            [two.render(s, 1024).data for s in range(0, 8192, 1024)]
        )
        np.testing.assert_allclose(parts, full, atol=1e-5)

    def test_triggered(self):
        kw = dict(attack_time=0.01, decay_time=0.02, sustain_time=0.05,
                  sustain_level=0.5, release_time=0.04)
        ours = pg.AdsrTriggeredPE(pg.PeriodicTrigger(hz=3.0), **kw)
        theirs = ref.AdsrTriggeredPE(ref.PeriodicTrigger(hz=3.0), **kw)
        _render_pair(ours, theirs, 0, SR // 2)


@needs_ref
class TestHoldParity:
    def test_sample_hold(self):
        ours = pg.SampleHoldPE(
            pg.SinePE(frequency=3.0), pg.PeriodicTrigger(hz=50.0)
        )
        theirs = ref.SampleHoldPE(
            ref.SinePE(frequency=3.0), ref.PeriodicTrigger(hz=50.0)
        )
        _render_pair(ours, theirs, 0, 8192)

    def test_track_hold(self):
        ours = pg.TrackHoldPE(
            pg.SinePE(frequency=3.0), pg.PeriodicGate(frequency=20.0, duty_cycle=0.3)
        )
        theirs = ref.TrackHoldPE(
            ref.SinePE(frequency=3.0), ref.PeriodicGate(frequency=20.0, duty_cycle=0.3)
        )
        _render_pair(ours, theirs, 0, 8192)


@needs_ref
class TestSlewParity:
    def test_linear(self):
        src_arr = np.zeros((4096, 1), np.float32)
        src_arr[500:] = 1.0
        src_arr[2500:] = -0.5
        ours = pg.SlewLimiterPE(pg.ArrayPE(src_arr), rise_rate=4.0, fall_rate=2.0)
        theirs = ref.SlewLimiterPE(
            ref.ArrayPE(src_arr), rise_rate=4.0, fall_rate=2.0
        )
        _render_pair(ours, theirs, 0, 4096)

    def test_exponential(self):
        src_arr = np.zeros((4096, 1), np.float32)
        src_arr[100:] = 1.0
        ours = pg.SlewLimiterPE(
            pg.ArrayPE(src_arr), rise_rate=8.0, mode=pg.SlewMode.EXPONENTIAL
        )
        theirs = ref.SlewLimiterPE(
            ref.ArrayPE(src_arr), rise_rate=8.0, mode=ref.SlewMode.EXPONENTIAL
        )
        _render_pair(ours, theirs, 0, 4096)


@needs_ref
class TestLoopParity:
    def test_finite_count(self):
        rng = np.random.default_rng(0)
        arr = rng.standard_normal((1000, 1)).astype(np.float32)
        ours = pg.LoopPE(pg.ArrayPE(arr), loop_start=0, loop_end=1000, count=3)
        theirs = ref.LoopPE(ref.ArrayPE(arr), loop_start=0, loop_end=1000, count=3)
        # NOTE: compared from t=0. Before its extent the reference LoopPE
        # leaks modulo-wrapped samples (loop_pe.py:206 uses out_indices %
        # loop_length on negative t), violating its own render contract
        # ("samples outside extent are zero-filled"); our engine applies
        # the documented contract centrally, so t<0 is zero here.
        _render_pair(ours, theirs, 0, 3300)

    def test_infinite_loop_window(self):
        rng = np.random.default_rng(1)
        arr = rng.standard_normal((777, 1)).astype(np.float32)
        ours = pg.LoopPE(pg.ArrayPE(arr), loop_start=0, loop_end=777)
        theirs = ref.LoopPE(ref.ArrayPE(arr), loop_start=0, loop_end=777)
        _render_pair(ours, theirs, 10_000, 4096)


@needs_ref
class TestReverseEchoParity:
    def _pair(self, **kw):
        sig = np.zeros((1500, 1), np.float32)
        rng = np.random.default_rng(4)
        sig[:1200] = rng.standard_normal((1200, 1)).astype(np.float32) * 0.3
        return (
            pg.ReversePitchEchoPE(pg.ArrayPE(sig), **kw),
            ref.ReversePitchEchoPE(ref.ArrayPE(sig), **kw),
        )

    def test_unity_pitch(self):
        ours, theirs = self._pair(
            block_seconds=0.01, pitch_ratio=1.0, feedback=0.5
        )
        _render_pair(ours, theirs, 0, 3000)

    def test_shifted_pitch_alternating(self):
        ours, theirs = self._pair(
            block_seconds=0.012, pitch_ratio=1.5, feedback=0.4,
            alternate_direction=1.0,
        )
        _render_pair(ours, theirs, 0, 3000, atol=2e-4)


@needs_ref
class TestFilterTailParity:
    """Stateful filters ring past the source extent in the reference
    (carried IIR state filtering the zero-fill); ours must too."""

    def test_biquad_tail(self):
        rng = np.random.default_rng(9)
        sig = rng.standard_normal((1000, 1)).astype(np.float32)
        ours = pg.BiquadPE(pg.ArrayPE(sig), 300.0, 8.0)  # high-Q rings
        theirs = ref.BiquadPE(ref.ArrayPE(sig), 300.0, 8.0)
        got = ours.render(0, 2000).data
        want = theirs.render(0, 2000).data
        # NB atol 5e-3 here, not the usual 1e-4: at Q=8 the resonance
        # amplifies the f32-scan vs f64-lfilter rounding into ~2e-3
        # drift. The moderate-Q parity tests in test_filters.py hold the
        # 1e-4 budget; this test is about the post-extent decay tail.
        np.testing.assert_allclose(got, want, atol=5e-3)
        assert np.abs(want[1000:1100]).max() > 1e-4  # the tail is real
        assert np.abs(got[1000:1100]).max() > 1e-4   # and ours rings too

    def test_comb_tail(self):
        rng = np.random.default_rng(10)
        sig = rng.standard_normal((800, 1)).astype(np.float32) * 0.3
        ours = pg.CombPE(pg.ArrayPE(sig), frequency=220.0, feedback=0.9)
        theirs = ref.CombPE(ref.ArrayPE(sig), frequency=220.0, feedback=0.9)
        got = ours.render(0, 2400).data
        want = theirs.render(0, 2400).data
        np.testing.assert_allclose(got, want, atol=1e-4)
        assert np.abs(want[900:]).max() > 1e-4
