"""DynamicsPE / CompressorPE / LimiterPE / ExpanderPE behavior breadth.

Mirrors reference tests/test_dynamics_pe.py:24-430 and
tests/test_compressor_pe.py:24-490 beyond the functional checks in
test_convolve_dynamics.py: construction surfaces, gain-law ordering,
soft knee, stereo link, sidechain ducking, and composite lifecycle.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    ArrayPE,
    CompressorPE,
    ConstantPE,
    DynamicsPE,
    ExpanderPE,
    GainPE,
    LimiterPE,
    SinePE,
)
from pygmu2_tpu.core.renderer import NullRenderer
from pygmu2_tpu.models.modes import DetectionMode, DynamicsMode
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'


def const_env(level: float, channels: int = 1):
    """An 'envelope' PE pinned at a linear level."""
    return ConstantPE(level, channels=channels)


def db(x):
    return 20.0 * np.log10(np.maximum(np.abs(x), 1e-10))


class TestDynamicsPEBasics:
    def test_create_default(self):
        pe = DynamicsPE(ConstantPE(0.5), const_env(0.5))
        assert pe.threshold == -20.0
        assert pe.ratio == 4.0
        assert pe.knee == 0.0
        assert pe.mode == DynamicsMode.COMPRESS
        assert pe.stereo_link is True

    def test_create_with_params(self):
        pe = DynamicsPE(
            ConstantPE(0.5), const_env(0.5), threshold=-10.0, ratio=8.0,
            knee=3.0, makeup_gain=2.0, mode=DynamicsMode.LIMIT,
            stereo_link=False,
        )
        assert pe.threshold == -10.0
        assert pe.ratio == 8.0
        assert pe.knee == 3.0
        assert pe.makeup_gain == 2.0
        assert pe.mode == DynamicsMode.LIMIT
        assert pe.stereo_link is False

    def test_inputs(self):
        src, env = ConstantPE(0.5), const_env(0.5)
        assert DynamicsPE(src, env).inputs() == [src, env]

    def test_is_pure(self):
        assert DynamicsPE(ConstantPE(0.5), const_env(0.5)).is_pure() is True

    def test_channel_count_passthrough(self):
        pe = DynamicsPE(ConstantPE(0.5, channels=2), const_env(0.5))
        assert pe.channel_count() == 2

    def test_auto_makeup_positive_for_compress(self):
        pe = DynamicsPE(ConstantPE(0.5), const_env(0.5), makeup_gain="auto")
        assert pe.makeup_gain > 0.0

    def test_auto_makeup_zero_for_gate(self):
        pe = DynamicsPE(
            ConstantPE(0.5), const_env(0.5), makeup_gain="auto",
            mode=DynamicsMode.GATE,
        )
        assert pe.makeup_gain == 0.0

    def test_repr(self):
        r = repr(DynamicsPE(ConstantPE(0.5), const_env(0.5), knee=2.0))
        assert "DynamicsPE" in r and "knee=2.0" in r and "compress" in r

    def test_extent_with_disjoint_inputs_does_not_crash(self):
        src = pg.CropPE(ConstantPE(0.5), 0, 100)
        env = pg.CropPE(const_env(0.5), 200, 100)
        pe = DynamicsPE(src, env)
        assert pe.extent().is_empty()
        d = np.asarray(pe.render(0, 50).data)  # reference law: no crash
        assert np.isfinite(d).all()


class TestDynamicsPEGainLaws:
    def _gain_at(self, env_level, **kw):
        """Output/input ratio for a unit source under a pinned envelope."""
        pe = DynamicsPE(
            ConstantPE(1.0), const_env(env_level), makeup_gain=0.0, **kw
        )
        return float(np.asarray(pe.render(0, 8).data)[0, 0])

    def test_no_compression_below_threshold(self):
        g = self._gain_at(10 ** (-40 / 20), threshold=-20.0, ratio=4.0)
        assert g == pytest.approx(1.0, abs=1e-6)

    def test_compression_above_threshold(self):
        # level -8 dB over a -20 dB threshold at 4:1 → gain = -9 dB
        g = self._gain_at(10 ** (-8 / 20), threshold=-20.0, ratio=4.0)
        assert db(g) == pytest.approx(12 * (1 / 4 - 1), abs=1e-3)

    def test_higher_ratio_more_compression(self):
        g4 = self._gain_at(0.5, threshold=-20.0, ratio=4.0)
        g10 = self._gain_at(0.5, threshold=-20.0, ratio=10.0)
        assert g10 < g4 < 1.0

    def test_soft_knee_gradual_transition(self):
        # exactly at threshold: hard knee = no reduction, soft knee = some
        at_thresh = 10 ** (-20 / 20)
        hard = self._gain_at(at_thresh, threshold=-20.0, ratio=4.0, knee=0.0)
        soft = self._gain_at(at_thresh, threshold=-20.0, ratio=4.0, knee=12.0)
        assert hard == pytest.approx(1.0, abs=1e-5)
        assert soft < 1.0 - 1e-4

    def test_soft_knee_matches_hard_far_above(self):
        loud = 10 ** (0 / 20)
        hard = self._gain_at(loud, threshold=-20.0, ratio=4.0, knee=0.0)
        soft = self._gain_at(loud, threshold=-20.0, ratio=4.0, knee=6.0)
        assert db(soft) == pytest.approx(db(hard), abs=1e-3)

    def test_limit_mode_caps_at_threshold(self):
        # LIMIT: slope -1 → output level pinned at threshold
        g = self._gain_at(10 ** (-5 / 20), threshold=-20.0,
                          mode=DynamicsMode.LIMIT)
        out_db = -5 + db(g)
        assert out_db == pytest.approx(-20.0, abs=1e-3)

    def test_gate_silences_below_threshold(self):
        g = self._gain_at(10 ** (-60 / 20), threshold=-40.0,
                          mode=DynamicsMode.GATE, gate_range=-80.0)
        assert db(g) == pytest.approx(-80.0, abs=1e-3)

    def test_gate_passes_above_threshold(self):
        g = self._gain_at(10 ** (-20 / 20), threshold=-40.0,
                          mode=DynamicsMode.GATE)
        assert g == pytest.approx(1.0, abs=1e-6)

    def test_expander_reduces_below_threshold(self):
        g = self._gain_at(10 ** (-50 / 20), threshold=-40.0, ratio=2.0,
                          mode=DynamicsMode.EXPAND)
        assert db(g) == pytest.approx(-10.0, abs=1e-3)  # (thr-lvl)*(r-1)

    def test_expander_passes_above_threshold(self):
        g = self._gain_at(10 ** (-30 / 20), threshold=-40.0, ratio=2.0,
                          mode=DynamicsMode.EXPAND)
        assert g == pytest.approx(1.0, abs=1e-6)


class TestDynamicsPEStereoLink:
    def test_linked_uses_max_across_channels(self):
        env = ArrayPE(
            np.repeat([[0.01, 1.0]], 16, axis=0).astype(np.float32)
        )
        src = ConstantPE(1.0, channels=2)
        linked = DynamicsPE(src, env, threshold=-20.0, ratio=4.0,
                            makeup_gain=0.0, stereo_link=True)
        d = np.asarray(linked.render(0, 16).data)
        # both channels compressed by the LOUD channel's envelope
        assert d[0, 0] == pytest.approx(d[0, 1], abs=1e-6)
        assert d[0, 0] < 1.0

    def test_unlinked_independent_channels(self):
        env = ArrayPE(
            np.repeat([[0.01, 1.0]], 16, axis=0).astype(np.float32)
        )
        src = ConstantPE(1.0, channels=2)
        un = DynamicsPE(src, env, threshold=-20.0, ratio=4.0,
                        makeup_gain=0.0, stereo_link=False)
        d = np.asarray(un.render(0, 16).data)
        assert d[0, 0] == pytest.approx(1.0, abs=1e-5)  # quiet env: no GR
        assert d[0, 1] < 1.0                            # loud env: GR

    def test_sidechain_ducking(self):
        # duck a constant bed under a loud sidechain envelope
        bed = ConstantPE(0.8)
        duck_env = ArrayPE(
            np.concatenate(
                [np.full(64, 0.001), np.full(64, 1.0)]
            ).astype(np.float32)
        )
        pe = DynamicsPE(bed, duck_env, threshold=-20.0, ratio=10.0,
                        makeup_gain=0.0)
        d = np.asarray(pe.render(0, 128).data)[:, 0]
        assert d[10] == pytest.approx(0.8, abs=1e-5)  # sidechain quiet
        assert d[100] < 0.2                            # sidechain loud: duck


class TestCompressorPEComposite:
    def test_create_default(self):
        c = CompressorPE(ConstantPE(0.5))
        assert c.threshold == -20.0
        assert c.ratio == 4.0
        assert c.detection == DetectionMode.RMS
        assert c.lookahead == 0.0

    def test_create_with_params(self):
        c = CompressorPE(
            ConstantPE(0.5), threshold=-12.0, ratio=6.0, attack=0.005,
            release=0.2, knee=3.0, lookahead=0.001,
            detection=DetectionMode.PEAK,
        )
        assert c.threshold == -12.0 and c.ratio == 6.0
        assert c.detection == DetectionMode.PEAK
        assert c.lookahead == 0.001

    def test_is_not_pure(self):
        assert CompressorPE(ConstantPE(0.5)).is_pure() is False

    def test_channel_count_passthrough(self):
        assert CompressorPE(ConstantPE(0.5, channels=2)).channel_count() == 2

    def test_repr(self):
        r = repr(CompressorPE(ConstantPE(0.5), ratio=8.0))
        assert "CompressorPE" in r and "ratio=8.0" in r and "auto" in r

    def test_compression_reduces_loud_signal(self):
        loud = GainPE(SinePE(frequency=441.0), 0.9)
        comp = CompressorPE(loud, threshold=-20.0, ratio=8.0, makeup_gain=0.0)
        dry = np.asarray(loud.render(0, 8000).data)
        wet = np.asarray(comp.render(0, 8000).data)
        # compare past the attack warm-up (envelope starts from rest)
        assert np.abs(wet[4000:]).max() < 0.5 * np.abs(dry[4000:]).max()

    def test_quiet_signal_passes_through(self):
        quiet = GainPE(SinePE(frequency=441.0), 0.001)  # ≈ -60 dB
        comp = CompressorPE(quiet, threshold=-20.0, makeup_gain=0.0)
        dry = np.asarray(quiet.render(4000, 2000).data)
        wet = np.asarray(comp.render(4000, 2000).data)
        np.testing.assert_allclose(wet, dry, atol=5e-4)

    def test_contiguous_renders_match_oneshot_peak_detection(self):
        # PEAK detection is causal and chunk-invariant (the default RMS
        # detector's centered window legitimately differs near chunk
        # tails — same in the reference; see TestCompressorPEContract).
        def make():
            return CompressorPE(
                GainPE(SinePE(frequency=441.0), 0.9), makeup_gain=0.0,
                detection=DetectionMode.PEAK,
            )

        whole = np.asarray(make().render(0, 2048).data)
        comp2 = make()
        a = np.asarray(comp2.render(0, 1024).data)
        b = np.asarray(comp2.render(1024, 1024).data)
        np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=1e-5)

    def test_stereo_render(self):
        src = ArrayPE(
            (0.9 * np.sin(np.arange(2000) * 0.1))[:, None].repeat(2, 1)
            .astype(np.float32)
        )
        wet = np.asarray(CompressorPE(src, makeup_gain=0.0).render(0, 2000).data)
        assert wet.shape == (2000, 2)
        np.testing.assert_allclose(wet[:, 0], wet[:, 1], atol=1e-6)


class TestLimiterPEComposite:
    def test_create_default(self):
        lim = LimiterPE(ConstantPE(0.5))
        assert lim.ceiling == -1.0
        assert lim.detection == DetectionMode.PEAK
        assert lim.ratio == 100.0

    def test_create_with_params(self):
        lim = LimiterPE(ConstantPE(0.5), ceiling=-3.0, release=0.1)
        assert lim.ceiling == -3.0 and lim.release == 0.1

    def test_caps_output_near_ceiling(self):
        hot = GainPE(SinePE(frequency=441.0), 1.9)  # ≈ +5.6 dB peaks
        lim = LimiterPE(hot, ceiling=-1.0, lookahead=0.005)
        wet = np.asarray(lim.render(0, 8000).data)
        steady = np.abs(wet[4000:]).max()
        assert steady <= 10 ** (-1.0 / 20) * 1.15  # ~1 dB tolerance

    def test_repr(self):
        r = repr(LimiterPE(ConstantPE(0.5), ceiling=-2.0))
        assert "LimiterPE" in r and "ceiling=-2.0" in r


class TestExpanderPEComposite:
    def test_create_default(self):
        e = ExpanderPE(ConstantPE(0.5))
        assert e.threshold == -40.0
        assert e.gate_range == -80.0

    def test_create_with_params(self):
        e = ExpanderPE(ConstantPE(0.5), threshold=-30.0, gate_range=-60.0)
        assert e.threshold == -30.0 and e.gate_range == -60.0

    def test_is_not_pure(self):
        assert ExpanderPE(ConstantPE(0.5)).is_pure() is False

    def test_gate_silences_quiet_signal(self):
        quiet = GainPE(SinePE(frequency=441.0), 0.001)
        gated = ExpanderPE(quiet, threshold=-40.0, gate_range=-80.0)
        wet = np.asarray(gated.render(4000, 2000).data)
        dry = np.asarray(quiet.render(4000, 2000).data)
        assert np.abs(wet).max() < np.abs(dry).max() * 0.01

    def test_gate_passes_loud_signal(self):
        loud = GainPE(SinePE(frequency=441.0), 0.5)
        gated = ExpanderPE(loud, threshold=-40.0)
        wet = np.asarray(gated.render(4000, 2000).data)
        dry = np.asarray(loud.render(4000, 2000).data)
        np.testing.assert_allclose(
            np.abs(wet).max(), np.abs(dry).max(), rtol=0.05
        )

    def test_repr(self):
        r = repr(ExpanderPE(ConstantPE(0.5), threshold=-35.0))
        assert "ExpanderPE" in r and "threshold=-35.0" in r


class TestCompositeLifecycle:
    def _run(self, pe, n=512):
        r = NullRenderer()
        r.set_source(pe)
        with r:
            r.start()
            r.render(0, n)
        return r

    def test_compressor_through_renderer(self):
        self._run(CompressorPE(GainPE(SinePE(frequency=441.0), 0.9)))

    def test_expander_through_renderer(self):
        self._run(ExpanderPE(GainPE(SinePE(frequency=441.0), 0.001)))

    def test_limiter_through_renderer(self):
        self._run(LimiterPE(GainPE(SinePE(frequency=441.0), 1.5)))

    def test_compressor_no_manual_lifecycle(self):
        wet = np.asarray(
            CompressorPE(GainPE(SinePE(frequency=441.0), 0.9))
            .render(0, 512).data
        )
        assert np.isfinite(wet).all()

    def test_compressor_renders_after_renderer_lifecycle(self):
        comp = CompressorPE(GainPE(SinePE(frequency=441.0), 0.9))
        self._run(comp)
        wet = np.asarray(comp.render(0, 256).data)
        assert np.isfinite(wet).all()
