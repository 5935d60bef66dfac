"""Engine contract tests: the five core framework rules.

Mirrors the reference's tests/test_processing_element.py: render contract,
zero-fill, purity defaults, non-contiguous requests on stateful PEs,
sample-rate-at-construction guard.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    ConstantPE,
    CropPE,
    DiracPE,
    Extent,
    GainPE,
    IdentityPE,
    MixPE,
    ProcessingElement,
    SinePE,
    Snippet,
    SourcePE,
)
from pygmu2_tpu.core import config as _config


class CounterPE(ProcessingElement):
    """Stateful test PE: emits a running per-render block counter so we can
    observe state carry and gap-reset behavior."""

    def inputs(self):
        return []

    def channel_count(self):
        return 1

    def is_pure(self):
        return False

    def _trace(self, ctx):
        import jax.numpy as jnp

        count, _fresh = ctx.state(self, init=jnp.zeros((), jnp.float32))
        ctx.set_state(self, count + 1.0)
        return jnp.full((ctx.duration, 1), count, jnp.float32)


class TestRenderContract:
    def test_exact_duration(self):
        s = ConstantPE(0.5).render(0, 100)
        assert s.start == 0
        assert s.duration == 100
        assert s.channels == 1

    def test_negative_duration_raises(self):
        with pytest.raises(ValueError):
            ConstantPE(1.0).render(0, -1)

    def test_zero_duration_empty(self):
        s = ConstantPE(1.0, channels=2).render(5, 0)
        assert s.duration == 0
        assert s.channels == 2
        assert s.start == 5

    def test_zero_fill_outside_extent(self):
        pe = CropPE(ConstantPE(1.0), 10, 5)
        s = pe.render(0, 20)
        expect = np.zeros((20, 1), np.float32)
        expect[10:15] = 1.0
        np.testing.assert_array_equal(s.data, expect)

    def test_identity_values(self):
        s = IdentityPE().render(3, 4)
        np.testing.assert_array_equal(s.data[:, 0], [3.0, 4.0, 5.0, 6.0])

    def test_negative_start(self):
        s = DiracPE().render(-2, 5)
        np.testing.assert_array_equal(s.data[:, 0], [0, 0, 1, 0, 0])


class TestPurity:
    def test_sources_pure_by_default(self):
        assert ConstantPE(1.0).is_pure()
        assert IdentityPE().is_pure()

    def test_default_impure(self):
        assert CounterPE().is_pure() is False

    def test_pure_pe_random_access(self):
        pe = SinePE(frequency=441.0)
        a = pe.render(100, 50)
        b = pe.render(0, 200)
        np.testing.assert_allclose(a.data, b.data[100:150], atol=1e-6)


class TestStatefulSemantics:
    def test_state_carried_across_contiguous_renders(self):
        pe = CounterPE()
        assert pe.render(0, 4).data[0, 0] == 0.0
        assert pe.render(4, 4).data[0, 0] == 1.0
        assert pe.render(8, 4).data[0, 0] == 2.0

    def test_non_contiguous_resets_state(self):
        pe = CounterPE()
        assert pe.render(0, 4).data[0, 0] == 0.0
        assert pe.render(4, 4).data[0, 0] == 1.0
        # gap → the engine resets the state to init
        assert pe.render(100, 4).data[0, 0] == 0.0

    def test_reset_state(self):
        pe = CounterPE()
        pe.render(0, 4)
        pe.render(4, 4)
        pe.reset_state()
        assert pe.render(8, 4).data[0, 0] == 0.0

    def test_state_carries_across_different_durations(self):
        pe = CounterPE()
        assert pe.render(0, 4).data[0, 0] == 0.0
        assert pe.render(4, 16).data[0, 0] == 1.0
        assert pe.render(20, 8).data[0, 0] == 2.0


class TestSampleRateGuard:
    def test_construction_requires_sample_rate(self):
        old = _config.get_sample_rate()
        try:
            _config._sample_rate = None
            with pytest.raises(RuntimeError):
                ConstantPE(1.0)
        finally:
            _config._sample_rate = old

    def test_rate_captured_at_construction(self):
        pg.set_sample_rate(48000)
        pe = ConstantPE(1.0)
        assert pe.sample_rate == 48000
        pg.set_sample_rate(44100)
        assert pe.sample_rate == 48000


class TestGraphSharing:
    def test_diamond_pure_graph_renders_once(self):
        base = IdentityPE()
        left = GainPE(base, 2.0)
        right = GainPE(base, 3.0)
        mix = MixPE(left, right)
        s = mix.render(0, 5)
        np.testing.assert_array_equal(s.data[:, 0], [0, 5, 10, 15, 20])

    def test_scalar_or_pe_modulation(self):
        env = CropPE(ConstantPE(0.5), 0, 10)
        sig = GainPE(ConstantPE(2.0), env)
        s = sig.render(0, 20)
        np.testing.assert_allclose(s.data[:10, 0], 1.0)
        np.testing.assert_allclose(s.data[10:, 0], 0.0)
