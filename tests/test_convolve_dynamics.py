"""ConvolvePE / ReverbPE / DynamicsPE family tests + reference parity."""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    ArrayPE,
    CompressorPE,
    ConstantPE,
    ConvolvePE,
    CropPE,
    DiracPE,
    DynamicsMode,
    DynamicsPE,
    EnvelopePE,
    ExpanderPE,
    Extent,
    GainPE,
    LimiterPE,
    ReverbPE,
    SinePE,
)
from tests.ref_oracle import load_reference

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)

ref = load_reference()
SR = 44100


class TestConvolve:
    def test_impulse_reproduces_fir(self):
        h = np.array([1.0, 0.5, 0.25, -0.1], np.float32)
        conv = ConvolvePE(DiracPE(), ArrayPE(h))
        y = conv.render(0, 10).data[:, 0]
        np.testing.assert_allclose(y[:4], h, atol=1e-5)
        np.testing.assert_allclose(y[4:], 0.0, atol=1e-5)

    def test_matches_numpy_convolve(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, 3000).astype(np.float32)
        h = rng.uniform(-1, 1, 129).astype(np.float32)
        conv = ConvolvePE(ArrayPE(x), ArrayPE(h))
        y = conv.render(0, 3000 + 128).data[:, 0]
        expect = np.convolve(x.astype(np.float64), h.astype(np.float64))
        np.testing.assert_allclose(y, expect, atol=2e-4)

    def test_extent_adds_tail(self):
        conv = ConvolvePE(CropPE(ConstantPE(1.0), 0, 100), ArrayPE(np.ones(16, np.float32)))
        assert conv.extent() == Extent(0, 115)

    def test_block_invariance(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, 4096).astype(np.float32)
        h = rng.uniform(-1, 1, 333).astype(np.float32)

        def fresh():
            return ConvolvePE(ArrayPE(x), ArrayPE(h))

        one = fresh().render(0, 4096).data
        pe = fresh()
        parts = [pe.render(i * 1024, 1024).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-4)

    def test_mono_fir_stereo_src(self):
        x = np.zeros((10, 2), np.float32)
        x[0] = [1.0, 2.0]
        conv = ConvolvePE(ArrayPE(x), ArrayPE([0.5]))
        y = conv.render(0, 5).data
        np.testing.assert_allclose(y[0], [0.5, 1.0], atol=1e-6)

    def test_stereo_fir_mono_src(self):
        h = np.zeros((3, 2), np.float32)
        h[0] = [1.0, 0.0]
        h[1] = [0.0, 1.0]
        conv = ConvolvePE(DiracPE(), ArrayPE(h))
        y = conv.render(0, 4).data
        assert y.shape[1] == 2
        np.testing.assert_allclose(y[0], [1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(y[1], [0.0, 1.0], atol=1e-6)


    def test_infinite_fir_rejected(self):
        with pytest.raises(ValueError):
            ConvolvePE(DiracPE(), ConstantPE(1.0))

    def test_ir_energy_norm(self):
        assert ConvolvePE.ir_energy_norm(ArrayPE([3.0, 4.0])) == pytest.approx(5.0)
        assert ConvolvePE.ir_energy_norm(ConstantPE(1.0)) == 1.0


class TestReverb:
    def test_dry_only(self):
        src = ArrayPE(np.ones(100, np.float32))
        rev = ReverbPE(src, ArrayPE([1.0, 0.3, 0.1]), mix=0.0)
        y = rev.render(0, 100).data[:, 0]
        np.testing.assert_allclose(y, 1.0, atol=1e-5)

    def test_wet_normalized(self):
        src = ArrayPE(np.ones(50, np.float32))
        ir = ArrayPE([2.0])  # energy norm 2
        rev = ReverbPE(src, ir, mix=1.0)
        y = rev.render(0, 50).data[:, 0]
        np.testing.assert_allclose(y, 1.0, atol=1e-5)  # 2.0 * 1/2

    def test_mix_bounds(self):
        with pytest.raises(ValueError):
            ReverbPE(DiracPE(), ArrayPE([1.0]), mix=1.5)


class TestDynamics:
    def test_compressor_reduces_loud(self):
        loud = ConstantPE(1.0)  # 0 dBFS
        env = EnvelopePE(loud, attack=0.001, release=0.001)
        dyn = DynamicsPE(
            ConstantPE(1.0), env, threshold=-20.0, ratio=4.0, makeup_gain=0.0
        )
        y = dyn.render(0, 2000).data[:, 0]
        # 20 dB over threshold at 4:1 → 15 dB reduction
        np.testing.assert_allclose(
            20 * np.log10(y[-1]), -15.0, atol=0.5
        )

    def test_below_threshold_untouched(self):
        quiet = ConstantPE(0.01)  # -40 dB
        env = EnvelopePE(quiet, attack=0.001, release=0.001)
        dyn = DynamicsPE(
            ConstantPE(0.01), env, threshold=-20.0, ratio=4.0, makeup_gain=0.0
        )
        y = dyn.render(0, 2000).data[:, 0]
        np.testing.assert_allclose(y[-1], 0.01, atol=1e-4)

    def test_gate_silences_quiet(self):
        quiet = ConstantPE(0.001)
        env = EnvelopePE(quiet, attack=0.001, release=0.001)
        dyn = DynamicsPE(
            ConstantPE(0.001),
            env,
            threshold=-40.0,
            mode=DynamicsMode.GATE,
            makeup_gain=0.0,
        )
        y = dyn.render(0, 1000).data[:, 0]
        assert y[-1] < 1e-6

    def test_limiter_ceiling(self):
        hot = SinePE(frequency=441.0, amplitude=1.0)
        lim = LimiterPE(hot, ceiling=-6.0)
        y = lim.render(0, SR // 2).data[:, 0]
        peak_db = 20 * np.log10(np.abs(y[SR // 4 :]).max())
        assert peak_db < -4.5  # near the -6 dB ceiling

    def test_compressor_composite_runs(self):
        comp = CompressorPE(SinePE(frequency=441.0), threshold=-10.0, ratio=8.0)
        s = comp.render(0, 4000)
        assert s.duration == 4000
        assert np.isfinite(s.data).all()

    def test_expander_gates_silence(self):
        sig = np.zeros(4000, np.float32)
        sig[:2000] = 0.5
        exp = ExpanderPE(ArrayPE(sig), threshold=-30.0, release=0.001)
        y = exp.render(0, 4000).data[:, 0]
        np.testing.assert_allclose(y[500:1000], 0.5, atol=0.01)
        assert np.abs(y[3500:]).max() < 1e-3


@pytest.mark.skipif(ref is None, reason="reference not available")
class TestParityConvolveDynamics:
    def _both(self, build, duration=2048, tol=1e-4, start=0):
        ref.set_sample_rate(SR)
        pg.set_sample_rate(SR)
        ours = build(pg).render(start, duration).data
        theirs = build(ref).render(start, duration).data
        np.testing.assert_allclose(ours, theirs, atol=tol)

    def test_convolve_parity(self):
        rng = np.random.default_rng(5)
        x = rng.uniform(-1, 1, 3000).astype(np.float32)
        h = rng.uniform(-0.5, 0.5, 200).astype(np.float32)

        def build(m):
            return m.ConvolvePE(m.ArrayPE(x), m.ArrayPE(h))

        self._both(build, duration=3199, tol=2e-4)

    def test_reverb_parity(self):
        rng = np.random.default_rng(6)
        x = rng.uniform(-1, 1, 2000).astype(np.float32)
        ir = (rng.uniform(-1, 1, 500) * np.exp(-np.arange(500) / 100)).astype(
            np.float32
        )

        def build(m):
            return m.ReverbPE(m.ArrayPE(x), m.ArrayPE(ir), mix=0.4)

        self._both(build, duration=2400, tol=2e-4)

    def test_dynamics_parity(self):
        rng = np.random.default_rng(7)
        x = (rng.uniform(-1, 1, 3000) * np.linspace(0, 1, 3000)).astype(np.float32)

        def build(m):
            src = m.ArrayPE(x)
            cached = m.CachePE(src)
            env = m.EnvelopePE(cached, attack=0.05, release=0.05)
            return m.DynamicsPE(cached, env, threshold=-12.0, ratio=3.0, knee=6.0)

        self._both(build, duration=3000, tol=2e-4)

    def test_compressor_parity(self):
        rng = np.random.default_rng(8)
        x = (rng.uniform(-1, 1, 3000) * np.linspace(0, 1.2, 3000)).astype(np.float32)

        def build(m):
            return m.CompressorPE(m.ArrayPE(x), threshold=-15.0, ratio=4.0)

        self._both(build, duration=3000, tol=3e-4)
