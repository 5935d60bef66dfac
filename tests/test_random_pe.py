"""RandomPE coverage.

The reference ships RandomPE only as a disabled draft whose tests are
skipped (reference: src/pygmu2/random_pe.py-disabled:73,
tests/test_random_pe.py:6 importorskip); this suite covers the repo's
live implementation with the same behavior matrix: creation surface,
value-range and reproducibility laws, per-mode shape (steps /
continuity / bounded walk), trigger behavior, and the repo's standard
chunked==oneshot invariance for the stateful modes.
"""

import numpy as np
import pytest

from pygmu2_tpu import PeriodicTrigger, RandomMode, RandomPE
from pygmu2_tpu.core.extent import Extent


def render(pe, start=0, dur=2000):
    return np.asarray(pe.render(start, dur).data)[:, 0]


class TestRandomPEBasics:
    def test_create_default(self):
        pe = RandomPE()
        assert pe.rate == 1.0
        assert pe.min_value == 0.0
        assert pe.max_value == 1.0
        assert pe.mode == RandomMode.SAMPLE_HOLD
        assert pe.seed is None
        assert pe.trigger is None

    def test_create_custom(self):
        pe = RandomPE(
            rate=25.0, min_value=-2.0, max_value=2.0,
            mode=RandomMode.LINEAR, seed=42, step_size=0.2,
        )
        assert pe.rate == 25.0
        assert pe.min_value == -2.0 and pe.max_value == 2.0
        assert pe.mode == RandomMode.LINEAR
        assert pe.seed == 42
        assert pe.step_size == 0.2

    def test_rate_must_be_positive(self):
        with pytest.raises(ValueError, match="rate"):
            RandomPE(rate=0.0)

    def test_range_order_enforced(self):
        with pytest.raises(ValueError, match="max_value"):
            RandomPE(min_value=1.0, max_value=0.0)

    def test_step_size_positive(self):
        with pytest.raises(ValueError, match="step_size"):
            RandomPE(step_size=-0.5)

    def test_inputs_without_trigger(self):
        assert RandomPE().inputs() == []

    def test_inputs_with_trigger(self):
        trig = PeriodicTrigger(hz=100.0)
        assert RandomPE(trigger=trig).inputs() == [trig]

    def test_clocked_hold_is_pure(self):
        assert RandomPE().is_pure() is True

    def test_walk_is_stateful(self):
        assert RandomPE(mode=RandomMode.WALK).is_pure() is False
        assert RandomPE(mode=RandomMode.WALK).state_decays() is False

    def test_triggered_is_stateful(self):
        assert RandomPE(trigger=PeriodicTrigger(hz=10.0)).is_pure() is False

    def test_channel_count_mono(self):
        assert RandomPE().channel_count() == 1

    def test_extent_infinite(self):
        assert RandomPE().extent() == Extent(None, None)

    def test_repr(self):
        r = repr(RandomPE(rate=5.0, mode=RandomMode.SMOOTH))
        assert "RandomPE" in r and "smooth" in r and "5.0" in r

    def test_repr_mentions_trigger(self):
        r = repr(RandomPE(trigger=PeriodicTrigger(hz=10.0)))
        assert "PeriodicTrigger" in r


class TestRandomPEValues:
    @pytest.mark.parametrize(
        "mode",
        [RandomMode.SAMPLE_HOLD, RandomMode.LINEAR,
         RandomMode.SMOOTH, RandomMode.WALK],
    )
    def test_values_in_range(self, mode):
        pe = RandomPE(rate=100.0, min_value=-0.5, max_value=1.5, mode=mode)
        d = render(pe, 0, 4000)
        assert d.min() >= -0.5 - 1e-5
        assert d.max() <= 1.5 + 1e-5

    def test_seed_reproducibility(self):
        a = render(RandomPE(rate=50.0, seed=7))
        b = render(RandomPE(rate=50.0, seed=7))
        np.testing.assert_array_equal(a, b)

    def test_different_seeds_differ(self):
        a = render(RandomPE(rate=50.0, seed=1))
        b = render(RandomPE(rate=50.0, seed=2))
        assert np.abs(a - b).max() > 1e-3

    def test_values_spread_over_range(self):
        d = render(RandomPE(rate=200.0), 0, 44100)
        assert d.min() < 0.2 and d.max() > 0.8  # uniform-ish coverage

    def test_render_is_deterministic_at_any_offset(self):
        pe = RandomPE(rate=50.0, seed=3)
        a = render(pe, 100_000, 500)
        b = render(pe, 100_000, 500)
        np.testing.assert_array_equal(a, b)


class TestRandomModes:
    def test_sample_hold_has_steps(self):
        # rate 10 Hz @ 44100: plateaus of ~4410 samples
        d = render(RandomPE(rate=10.0, seed=5), 0, 10000)
        changes = np.nonzero(np.diff(d) != 0)[0]
        assert 1 <= len(changes) <= 3
        np.testing.assert_array_equal(d[: changes[0] + 1], d[0])

    def test_linear_is_continuous(self):
        d = render(RandomPE(rate=50.0, mode=RandomMode.LINEAR, seed=5), 0, 8000)
        # max per-sample jump bounded by range * rate / sr
        assert np.abs(np.diff(d)).max() <= 1.0 * 50.0 / 44100 + 1e-5

    def test_linear_hits_segment_values(self):
        hold = render(RandomPE(rate=10.0, seed=9), 0, 20000)
        lin = render(RandomPE(rate=10.0, mode=RandomMode.LINEAR, seed=9), 0, 20000)
        # at each segment start the interpolant equals the held value
        np.testing.assert_allclose(lin[0], hold[0], atol=1e-5)

    def test_smooth_is_continuous(self):
        d = render(RandomPE(rate=50.0, mode=RandomMode.SMOOTH, seed=5), 0, 8000)
        assert np.abs(np.diff(d)).max() <= 1.5 * 50.0 / 44100 + 1e-5

    def test_smooth_flat_at_segment_boundaries(self):
        # smoothstep derivative is 0 at segment edges: samples straddling
        # a boundary differ far less than mid-segment slope
        pe = RandomPE(rate=44.1, mode=RandomMode.SMOOTH, seed=5)
        d = render(pe, 0, 10000)
        period = 1000
        edges = np.abs(np.diff(d))[period - 2 : period + 1]
        mid = np.abs(np.diff(d))[period // 2 - 1 : period // 2 + 2]
        assert edges.max() < mid.max() + 1e-6

    def test_walk_stays_in_bounds(self):
        pe = RandomPE(
            rate=2000.0, min_value=-1.0, max_value=1.0,
            mode=RandomMode.WALK, step_size=0.5, seed=3,
        )
        d = render(pe, 0, 44100)
        assert d.min() >= -1.0 - 1e-5 and d.max() <= 1.0 + 1e-5

    def test_walk_has_small_steps(self):
        pe = RandomPE(
            rate=1000.0, mode=RandomMode.WALK, step_size=0.05, seed=3
        )
        d = render(pe, 0, 20000)
        assert np.abs(np.diff(d)).max() <= 0.05 * 1.0 + 1e-5

    def test_walk_starts_at_midpoint(self):
        pe = RandomPE(
            rate=10.0, min_value=2.0, max_value=4.0, mode=RandomMode.WALK
        )
        assert render(pe, 0, 10)[0] == pytest.approx(3.0, abs=0.11)

    def test_walk_moves(self):
        d = render(
            RandomPE(rate=500.0, mode=RandomMode.WALK, seed=1), 0, 44100
        )
        assert np.ptp(d) > 0.05


class TestRandomPETrigger:
    def test_trigger_changes_value(self):
        pe = RandomPE(trigger=PeriodicTrigger(hz=441.0), seed=4)
        d = render(pe, 0, 2000)
        changes = np.nonzero(np.diff(d) != 0)[0]
        # 441 Hz trigger: a change every ~100 samples
        assert len(changes) >= 15

    def test_value_held_between_triggers(self):
        pe = RandomPE(trigger=PeriodicTrigger(hz=100.0), seed=4)
        d = render(pe, 0, 2000)
        period = 441
        np.testing.assert_array_equal(d[1:period], d[1])

    def test_trigger_respects_seed(self):
        a = render(RandomPE(trigger=PeriodicTrigger(hz=100.0), seed=11))
        b = render(RandomPE(trigger=PeriodicTrigger(hz=100.0), seed=11))
        np.testing.assert_array_equal(a, b)

    def test_trigger_walk_steps_only_on_trigger(self):
        pe = RandomPE(
            trigger=PeriodicTrigger(hz=100.0), mode=RandomMode.WALK,
            step_size=0.1, seed=2,
        )
        d = render(pe, 0, 2000)
        changes = np.nonzero(np.diff(d) != 0)[0] + 1
        assert len(changes) >= 3
        assert np.all(changes % 441 == 0)  # only at trigger instants

    def test_trigger_values_in_range(self):
        pe = RandomPE(
            trigger=PeriodicTrigger(hz=500.0), min_value=0.25,
            max_value=0.75, seed=8,
        )
        d = render(pe, 0, 8000)
        assert d.min() >= 0.25 - 1e-6 and d.max() <= 0.75 + 1e-6


class TestRandomPEChunkInvariance:
    @pytest.mark.parametrize(
        "mode", [RandomMode.SAMPLE_HOLD, RandomMode.LINEAR, RandomMode.SMOOTH]
    )
    def test_pure_modes_chunk_invariant(self, mode):
        pe = RandomPE(rate=97.0, mode=mode, seed=6)
        whole = render(pe, 0, 3000)
        parts = np.concatenate(
            [render(pe, s, 375) for s in range(0, 3000, 375)]
        )
        np.testing.assert_array_equal(whole, parts)

    def test_walk_segment_path_matches_per_sample_path(self):
        # rate 10 kHz: a 4096-sample one-shot takes the segment-granular
        # scan (s_max ≈ 931 < T//4), while 32-sample chunks route to the
        # per-sample scan (s_max ≈ 10 ≥ T//4). Contiguous chunked output
        # must equal the one-shot bit-for-bit up to f32 noise.
        whole = render(
            RandomPE(rate=10000.0, mode=RandomMode.WALK, seed=13), 0, 4096
        )
        pe = RandomPE(rate=10000.0, mode=RandomMode.WALK, seed=13)
        parts = np.concatenate(
            [render(pe, s, 32) for s in range(0, 4096, 32)]
        )
        np.testing.assert_allclose(parts, whole, atol=1e-6)

    def test_walk_contiguous_renders_continuous(self):
        pe = RandomPE(rate=200.0, mode=RandomMode.WALK, seed=6)
        whole = render(pe, 0, 2000)
        pe2 = RandomPE(rate=200.0, mode=RandomMode.WALK, seed=6)
        a = render(pe2, 0, 1000)
        b = render(pe2, 1000, 1000)
        np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=1e-6)

    def test_triggered_contiguous_renders_continuous(self):
        trig_rate = 100.0
        whole = render(
            RandomPE(trigger=PeriodicTrigger(hz=trig_rate), seed=6), 0, 2000
        )
        pe2 = RandomPE(trigger=PeriodicTrigger(hz=trig_rate), seed=6)
        a = render(pe2, 0, 1000)
        b = render(pe2, 1000, 1000)
        np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=1e-6)
