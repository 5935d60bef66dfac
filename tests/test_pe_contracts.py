"""Per-PE contract coverage, reference-style.

Mirrors the reference's per-PE ``Test<PE>Basics`` / ``Test<PE>Render``
structure (reference CONTRIBUTING.md:419-457): every exported PE gets
construction / inputs() / is_pure() / channel_count() / extent /
__repr__ / zero-duration / basic-render checks, and every stateful PE
gets multi-block-size chunked==oneshot invariance.

The shared assertions live in two mixins; each PE pins its expected
contract values as class attributes (these ARE the framework contract —
SURVEY §1 contracts 1-5).
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core.processing_element import ProcessingElement

SR = 44100


@pytest.fixture(autouse=True)
def _sr():
    pg.set_sample_rate(SR)


def arr(n=300, c=1, seed=None):
    if seed is None:
        data = np.linspace(0, 1, n * c, dtype=np.float32).reshape(n, c)
    else:
        data = (
            np.random.default_rng(seed).standard_normal((n, c)) * 0.4
        ).astype(np.float32)
    return pg.ArrayPE(data)


def _wav_file(tmp_path_factory=None):
    from pygmu2_tpu.utils import wavio

    path = "/tmp/pe_contract_src.wav"
    data = (np.sin(np.arange(400) * 0.05) * 0.5).astype(np.float32)
    wavio.write_wav(path, data[:, None], SR)
    return path


class BasicsMixin:
    """Shared Test<PE>Basics assertions; subclasses pin the contract."""

    PURE: bool
    CHANNELS: int | None
    N_INPUTS: int
    EXTENT: str  # "finite" | "infinite" | "half" | "any"

    def make(self):
        raise NotImplementedError

    def test_construction_and_repr(self):
        pe = self.make()
        assert isinstance(pe, ProcessingElement)
        name = type(pe).__name__
        assert name in repr(pe)

    def test_inputs_complete(self):
        pe = self.make()
        ins = pe.inputs()
        assert len(ins) == self.N_INPUTS
        assert all(isinstance(i, ProcessingElement) for i in ins)

    def test_purity_flag(self):
        assert self.make().is_pure() == self.PURE

    def test_channel_count(self):
        assert self.make().channel_count() == self.CHANNELS

    def test_extent_shape_and_stability(self):
        pe = self.make()
        ext = pe.extent()
        if self.EXTENT == "finite":
            assert ext.start is not None and ext.end is not None
        elif self.EXTENT == "infinite":
            assert ext.start is None and ext.end is None
        elif self.EXTENT == "half":
            assert (ext.start is None) != (ext.end is None)
        # extent stability (reference CONTRIBUTING "Extent Stability")
        assert pe.extent() == ext

    def test_zero_duration_render(self):
        snip = self.make().render(0, 0)
        assert snip.data.shape[0] == 0

    def test_negative_duration_raises(self):
        with pytest.raises(ValueError):
            self.make().render(0, -1)


class RenderMixin(BasicsMixin):
    """Adds actual-render checks (finite values, correct shape)."""

    RENDER_N = 256
    NONSILENT = True

    def test_render_shape_and_finite(self):
        pe = self.make()
        out = np.asarray(pe.render(0, self.RENDER_N).data)
        assert out.shape[0] == self.RENDER_N
        assert out.shape[1] == (self.CHANNELS or 1)
        assert np.isfinite(out).all()
        if self.NONSILENT:
            assert np.abs(out).max() > 0.0


class StatefulMixin(RenderMixin):
    """Stateful PEs must be block-size invariant (state carry)."""

    CHUNK_TOL = 1e-5
    TOTAL = 1024

    @pytest.mark.parametrize("block", [128, 256])
    def test_chunked_matches_oneshot(self, block):
        one = np.asarray(self.make().render(0, self.TOTAL).data)
        pe = self.make()
        chunks = [
            np.asarray(pe.render(s, block).data)
            for s in range(0, self.TOTAL, block)
        ]
        np.testing.assert_allclose(
            np.concatenate(chunks), one, atol=self.CHUNK_TOL
        )


# ---- sources / oscillators ----------------------------------------------


class TestConstantPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 2, 0, "infinite"

    def make(self):
        return pg.ConstantPE(0.5, channels=2)


class TestParamPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.ParamPE("cutoff", default=0.7)


class TestIdentityPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.IdentityPE()

    def test_output_equals_index(self):
        out = np.asarray(self.make().render(5, 10).data)[:, 0]
        np.testing.assert_array_equal(out, np.arange(5, 15))


class TestDiracPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.DiracPE()

    def test_impulse_at_zero(self):
        out = np.asarray(self.make().render(-2, 5).data)[:, 0]
        np.testing.assert_array_equal(out, [0, 0, 1, 0, 0])


class TestArrayPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 2, 0, "finite"

    def make(self):
        return arr(100, 2)

    def test_zero_fill_outside_extent(self):
        out = np.asarray(self.make().render(90, 20).data)
        assert np.all(out[10:] == 0.0)


class TestPiecewisePEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "finite"

    def make(self):
        return pg.PiecewisePE([(0, 0.0), (100, 1.0), (200, 0.5)])


class TestNoisePEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 0, "infinite"

    def make(self):
        return pg.NoisePE(seed=1)

    def test_seed_reproducible(self):
        a = np.asarray(pg.NoisePE(seed=3).render(0, 200).data)
        b = np.asarray(pg.NoisePE(seed=3).render(0, 200).data)
        np.testing.assert_array_equal(a, b)

    def test_pink_and_brown_modes(self):
        for mode in (pg.NoiseMode.PINK, pg.NoiseMode.BROWN):
            out = np.asarray(
                pg.NoisePE(seed=2, mode=mode).render(0, 400).data
            )
            assert np.isfinite(out).all() and np.abs(out).max() > 0


class TestSinePEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.SinePE(frequency=440.0, amplitude=0.7)

    def test_analytic_waveform(self):
        out = np.asarray(self.make().render(0, 500).data)[:, 0]
        t = np.arange(500) / SR
        np.testing.assert_allclose(
            out, 0.7 * np.sin(2 * np.pi * 440.0 * t), atol=1e-5
        )

    def test_modulated_is_impure(self):
        pe = pg.SinePE(frequency=pg.ConstantPE(440.0))
        assert not pe.is_pure()
        assert len(pe.inputs()) == 1


class TestBlitSawPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 0, "infinite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.BlitSawPE(frequency=220.0)


class TestSuperSawPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 0, "infinite"
    CHUNK_TOL = 1e-4

    def make(self):
        # seed pins the randomized per-voice phases so two instances
        # (one-shot vs chunked) start identically
        return pg.SuperSawPE(frequency=220.0, voices=5, seed=0)


class TestAnalogOscPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.AnalogOscPE(frequency=220.0)

    def test_sawtooth_waveform_renders(self):
        out = np.asarray(
            pg.AnalogOscPE(frequency=220.0, waveform="sawtooth")
            .render(0, 400).data
        )
        assert np.abs(out).max() > 0.1


class TestFunctionGenPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.FunctionGenPE(frequency=220.0)

    def test_rectangle_is_two_valued(self):
        out = np.asarray(self.make().render(0, 400).data)[:, 0]
        assert set(np.round(np.unique(out), 3)).issubset({-1.0, 1.0})


class TestWavetablePEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 2, "infinite"

    def make(self):
        return pg.WavetablePE(arr(64), pg.IdentityPE())


class TestKarplusStrongPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 0, "half"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.KarplusStrongPE(frequency=220.0, seed=1)


class TestPortamentoPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "infinite"

    def make(self):
        return pg.PortamentoPE([(60.0, 0, 100), (64.0, 100, 100)])


class TestControlPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 0, "infinite"

    def make(self):
        return pg.ControlPE(0.3)

    def test_set_value_from_host(self):
        pe = pg.ControlPE(0.1)
        pe.set_value(0.9)
        out = np.asarray(pe.render(0, 10).data)
        np.testing.assert_allclose(out, 0.9, atol=1e-6)


class TestPeriodicGateContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.PeriodicGate(frequency=100.0)

    def test_output_is_binary(self):
        out = np.asarray(self.make().render(0, 800).data)[:, 0]
        assert set(np.unique(out)).issubset({0.0, 1.0})


class TestPeriodicTriggerContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.PeriodicTrigger(hz=100.0)

    def test_trigger_count_matches_rate(self):
        out = np.asarray(self.make().render(0, SR).data)[:, 0]
        assert abs(int((out > 0).sum()) - 100) <= 1


class TestWavReaderPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "finite"

    def make(self):
        return pg.WavReaderPE(_wav_file())


class TestAudioReaderPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "finite"

    def make(self):
        return pg.AudioReaderPE(_wav_file())


# ---- transforms / routing ------------------------------------------------


class TestGainPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.GainPE(arr(), 0.5)

    def test_scales_samples(self):
        src = arr(100)
        direct = np.asarray(src.render(0, 100).data)
        scaled = np.asarray(pg.GainPE(arr(100), 0.5).render(0, 100).data)
        np.testing.assert_allclose(scaled, direct * 0.5, atol=1e-6)


class TestMixPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 2, "finite"

    def make(self):
        return pg.MixPE(arr(), arr())

    def test_sums_inputs(self):
        single = np.asarray(arr(100).render(0, 100).data)
        mixed = np.asarray(
            pg.MixPE(arr(100), arr(100)).render(0, 100).data
        )
        np.testing.assert_allclose(mixed, 2 * single, atol=1e-6)


class TestDelayPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.DelayPE(arr(), 10)

    def test_integer_delay_shifts(self):
        src = np.asarray(arr(100).render(0, 100).data)
        out = np.asarray(pg.DelayPE(arr(100), 10).render(10, 90).data)
        np.testing.assert_allclose(out, src[:90], atol=1e-6)


class TestCropPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.CropPE(pg.SinePE(frequency=440.0), 0, 100)

    def test_zeros_outside_window(self):
        out = np.asarray(self.make().render(90, 30).data)
        assert np.all(out[10:] == 0) and np.abs(out[:10]).max() > 0


class TestSetExtentPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.SetExtentPE(arr(), 0, 50)


class TestSlicePEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.SlicePE(arr(), 10, 50)

    def test_reorigins_to_zero(self):
        src = np.asarray(arr(300).render(0, 300).data)
        out = np.asarray(self.make().render(0, 50).data)
        np.testing.assert_allclose(out, src[10:60], atol=1e-6)


class TestLoopPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.LoopPE(arr(100), count=3)

    def test_repeats_content(self):
        src = np.asarray(arr(100).render(0, 100).data)
        out = np.asarray(self.make().render(0, 300).data)
        np.testing.assert_allclose(out[100:200], src, atol=1e-6)


class TestSequencePEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.SequencePE((arr(100), 0), (arr(100), 150))


class TestTransformPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.TransformPE(arr(), func=lambda x: x * 2.0)

    def test_applies_function(self):
        src = np.asarray(arr(100).render(0, 100).data)
        out = np.asarray(
            pg.TransformPE(arr(100), func=lambda x: x * 2.0)
            .render(0, 100).data
        )
        np.testing.assert_allclose(out, 2 * src, atol=1e-6)


class TestTimeWarpPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"
    CHUNK_TOL = 1e-4
    TOTAL = 512

    def make(self):
        return pg.TimeWarpPE(arr(1024, seed=5), rate=1.5)


class TestTriggerRestartPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 2, "infinite"

    def make(self):
        return pg.TriggerRestartPE(
            pg.PeriodicTrigger(hz=SR / 400.0), arr(350)
        )


class TestRandomPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 0, "infinite"

    def make(self):
        return pg.RandomPE(rate=100.0, seed=2)


class TestRandomPEWalkContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 0, "infinite"

    def make(self):
        return pg.RandomPE(rate=300.0, mode=pg.RandomMode.WALK, seed=2)


class TestRandomPETriggeredContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "infinite"

    def make(self):
        return pg.RandomPE(trigger=pg.PeriodicTrigger(hz=441.0), seed=2)


class TestResetPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 2, "infinite"

    def make(self):
        return pg.ResetPE(arr(300), pg.PeriodicTrigger(hz=200.0))


class TestTriggerPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 2, "infinite"

    def make(self):
        return pg.TriggerPE(
            pg.PeriodicTrigger(hz=100.0), arr(300), mode=pg.TriggerMode.ONE_SHOT
        )


class TestTriggerPEGatedContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 2, "infinite"

    def make(self):
        return pg.TriggerPE(
            pg.PeriodicGate(frequency=50.0), arr(300), mode=pg.TriggerMode.GATED
        )


class TestRandomSelectPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 3, "infinite"

    def make(self):
        return pg.RandomSelectPE(
            pg.PeriodicTrigger(hz=SR / 400.0), [arr(350), arr(350)], seed=1
        )


class TestSampleHoldPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 2, "infinite"

    def make(self):
        return pg.SampleHoldPE(
            arr(2048, seed=2), pg.PeriodicTrigger(hz=SR / 100.0)
        )


class TestTrackHoldPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 2, "infinite"

    def make(self):
        return pg.TrackHoldPE(
            arr(2048, seed=2), pg.PeriodicGate(frequency=SR / 256.0)
        )


class TestSlewLimiterPEContract(StatefulMixin):
    # extent is infinite like the reference's (slew_limiter_pe.py:94-95
    # returns Extent(None, None): the limiter keeps slewing toward the
    # last value forever)
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "infinite"

    def make(self):
        return pg.SlewLimiterPE(arr(2048, seed=3), rise_rate=2.0)

    def test_limits_rise_rate(self):
        step = np.zeros((500, 1), np.float32)
        step[100:] = 1.0
        out = np.asarray(
            pg.SlewLimiterPE(pg.ArrayPE(step), rise_rate=10.0)
            .render(0, 500).data
        )[:, 0]
        assert np.max(np.diff(out)) <= 10.0 / SR + 1e-6


class TestCachePEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.CachePE(arr())


# ---- envelopes / dynamics ------------------------------------------------


class TestAdsrGatedPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "infinite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.AdsrGatedPE(pg.PeriodicGate(frequency=SR / 512.0))


class TestAdsrTriggeredPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "infinite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.AdsrTriggeredPE(
            pg.PeriodicTrigger(hz=SR / 512.0), attack_time=0.001,
            decay_time=0.002, sustain_time=0.003, release_time=0.002,
        )


class TestEnvelopePEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"

    def make(self):
        return pg.EnvelopePE(arr(2048, seed=4), attack=0.002, release=0.05)


class TestDynamicsPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 2, "finite"

    def make(self):
        src = pg.CachePE(arr(2048, seed=4))
        return pg.DynamicsPE(src, pg.EnvelopePE(src))


class TestCompressorPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"

    def make(self):
        return pg.CompressorPE(arr(2048, seed=4), threshold=-20.0)

    def test_chunked_matches_reference_chunked(self):
        """The default RMS detector's centered window sees the future,
        so one-shot and chunked renders legitimately differ near chunk
        tails — in the reference too (envelope_pe.py:222-231 runs
        uniform_filter1d per pulled block). The invariant that must
        hold is parity with the reference at the SAME block size."""
        from tests.ref_oracle import load_reference

        ref = load_reference()
        if ref is None:
            pytest.skip("reference not available")
        ref.set_sample_rate(SR)
        data = (
            np.random.default_rng(4).standard_normal((2048, 1)) * 0.4
        ).astype(np.float32)
        ours = pg.CompressorPE(pg.ArrayPE(data), threshold=-20.0)
        theirs = ref.CompressorPE(ref.ArrayPE(data), threshold=-20.0)
        for s0 in range(0, 1024, 256):
            a = np.asarray(ours.render(s0, 256).data)
            b = np.asarray(theirs.render(s0, 256).data)
            np.testing.assert_allclose(a, b, atol=5e-4)


class TestLimiterPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.LimiterPE(arr(2048, seed=4))


class TestExpanderPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.ExpanderPE(arr(2048, seed=4))


# ---- filters -------------------------------------------------------------


class TestBiquadPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"

    def make(self):
        return pg.BiquadPE(arr(2048, seed=6), 2000.0, 1.0)

    def test_all_modes_render(self):
        for mode in pg.BiquadMode:
            out = np.asarray(
                pg.BiquadPE(arr(512, seed=6), 1500.0, 1.0, mode=mode)
                .render(0, 256).data
            )
            assert np.isfinite(out).all()


class TestSVFilterPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"

    def make(self):
        return pg.SVFilterPE(arr(2048, seed=6), 2000.0, 1.0)


class TestLadderPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.LadderPE(arr(2048, seed=6), 2000.0, resonance=0.4)


class TestCombPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.CombPE(arr(2048, seed=6), 220.0, feedback=0.6)


# ---- effects / analysis --------------------------------------------------


class TestConvolvePEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 2, "finite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.ConvolvePE(arr(2048, seed=7), arr(32, seed=8))


class TestReverbPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.ReverbPE(arr(1024, seed=7), arr(64, seed=8))


class TestReversePitchEchoPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"
    CHUNK_TOL = 1e-4

    def make(self):
        return pg.ReversePitchEchoPE(
            arr(2048, seed=9), block_seconds=0.005, feedback=0.5,
            max_delay_seconds=0.02,
        )


class TestSpatialPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 2, 1, "finite"

    def make(self):
        return pg.SpatialPE(
            arr(), method=pg.SpatialConstantPower(azimuth=-30.0)
        )

    def test_pan_full_left_silences_right(self):
        pe = pg.SpatialPE(
            arr(), method=pg.SpatialConstantPower(azimuth=-90.0)
        )
        out = np.asarray(pe.render(0, 200).data)
        assert np.abs(out[:, 0]).max() > 0.01
        assert np.abs(out[:, 1]).max() < 1e-6


class TestTralfamPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.TralfamPE(arr(512, seed=10), seed=1)


class TestWindowPEContract(RenderMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = True, 1, 1, "finite"

    def make(self):
        return pg.WindowPE(arr(1024, seed=11), window=0.002)


class TestWavWriterPEContract(StatefulMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 1, "finite"

    def make(self):
        return pg.WavWriterPE(arr(2048, seed=12), "/tmp/pe_contract_out.wav")


# ---- host-bridged sources ------------------------------------------------


def _sf2_file():
    from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample

    path = "/tmp/pe_contract_font.sf2"
    with open(path, "wb") as f:
        f.write(
            build_sf2(
                [{"data": make_looped_sample(261.63), "rate": SR,
                  "root_key": 60, "loop": True}]
            )
        )
    return path


class TestMeltysynthPEContract(BasicsMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 2, 0, "infinite"

    def make(self):
        return pg.MeltysynthPE(_sf2_file(), block_size=64)

    def test_renders_notes_after_midi(self):
        pe = self.make()
        r = pg.NullRenderer(SR)
        c = pg.CropPE(pe, 0, 256)
        r.set_source(c)
        r.start()
        pe.synthesizer.process_midi_message(0, 0x90, 60, 100)
        out = np.asarray(c.render(0, 256).data)
        r.stop()
        assert out.shape == (256, 2)
        assert np.abs(out).max() > 1e-4

    def test_silent_without_events(self):
        pe = self.make()
        r = pg.NullRenderer(SR)
        c = pg.CropPE(pe, 0, 256)
        r.set_source(c)
        r.start()
        out = np.asarray(c.render(0, 256).data)
        r.stop()
        assert np.abs(out).max() == 0.0


class TestMidiInPEContract(BasicsMixin):
    PURE, CHANNELS, N_INPUTS, EXTENT = False, 1, 0, "infinite"

    def make(self):
        return pg.MidiInPE(require_mido=False)

    def test_emits_silence_and_drains_queue(self):
        got = []
        pe = pg.MidiInPE(
            require_mido=False,
            callback=lambda start, msg: got.append((start, msg)),
        )
        r = pg.NullRenderer(SR)
        c = pg.CropPE(pe, 0, 128)
        r.set_source(c)
        r.start()
        pe.feed("note_on_60")
        pe.feed("note_off_60")
        out = np.asarray(c.render(0, 128).data)
        r.stop()
        assert np.abs(out).max() == 0.0  # MidiInPE emits silence
        assert [m for _s, m in got] == ["note_on_60", "note_off_60"]
        assert all(s == 0 for s, _m in got)  # block_start passed through


class TestEveryExportedPEHasAContract:
    """Self-enforcing coverage invariant: every ProcessingElement class
    exported at the package top level must be instantiated by some
    contract suite above (reference pattern: CONTRIBUTING.md:419-457 —
    per-PE test classes for the whole inventory)."""

    # Abstract/adapter surfaces that are contract-covered through their
    # concrete subclasses or dedicated suites elsewhere.
    EXEMPT = {
        "ProcessingElement",   # abstract base
        "SourcePE",            # abstract base
        "GateSignal",          # abstract signal marker (PeriodicGate covers)
        "TriggerSignal",       # abstract signal marker (PeriodicTrigger)
        "SpatialMethod",       # strategy base (SpatialPE contract covers)
        "SpatialAdapter",      # strategy, covered via SpatialPE suites
        "SpatialLinear",       # strategy
        "SpatialConstantPower",  # strategy
        "SpatialHRTF",         # strategy
    }

    def test_all_pe_classes_covered(self):
        import inspect
        import sys

        from pygmu2_tpu.core.processing_element import ProcessingElement

        exported = {
            name
            for name in pg.__all__
            if inspect.isclass(getattr(pg, name))
            and issubclass(getattr(pg, name), ProcessingElement)
        } - self.EXEMPT

        mod = sys.modules[__name__]
        covered: set[str] = set()
        for cname in dir(mod):
            cls = getattr(mod, cname)
            if (
                inspect.isclass(cls)
                and cname.startswith("Test")
                and hasattr(cls, "make")
                and cls not in (BasicsMixin, RenderMixin, StatefulMixin)
            ):
                try:
                    pe = cls().make()
                except Exception:
                    continue
                for node in _walk_types(pe):
                    covered.add(node)

        missing = sorted(exported - covered)
        assert not missing, (
            f"exported PEs without a contract suite: {missing} — add a "
            "Test<PE>Contract class with the appropriate mixin."
        )


def _walk_types(pe):
    """Type names of a PE and its whole input graph."""
    seen, out = set(), set()
    stack = [pe]
    while stack:
        node = stack.pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        out.add(type(node).__name__)
        stack.extend(node.inputs())
    return out
