"""ReversePitchEcho, Spatial*, Tralfam, TriggerRestart, RandomSelect, MidiIn."""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    DiracPE,
    Extent,
    IdentityPE,
    MidiInPE,
    NoisePE,
    PeriodicTrigger,
    RandomSelectPE,
    ReversePitchEchoPE,
    SinePE,
    SpatialAdapter,
    SpatialConstantPower,
    SpatialHRTF,
    SpatialLinear,
    SpatialPE,
    TralfamPE,
    TriggerRestartPE,
)
from tests.ref_oracle import load_reference

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)

ref = load_reference()
SR = 44100


class TestSpatialAdapter:
    def test_mono_to_stereo(self):
        pe = SpatialPE(ConstantPE(0.5), method=SpatialAdapter(2))
        s = pe.render(0, 10)
        assert s.channels == 2
        np.testing.assert_allclose(s.data, 0.5)

    def test_stereo_to_mono_averages(self):
        src = ArrayPE(np.array([[1.0, 0.0]] * 5, np.float32))
        pe = SpatialPE(src, method=SpatialAdapter(1))
        np.testing.assert_allclose(pe.render(0, 5).data[:, 0], 0.5)

    def test_stereo_to_quad(self):
        src = ArrayPE(np.array([[1.0, 0.0]] * 3, np.float32))
        s = SpatialPE(src, method=SpatialAdapter(4)).render(0, 3)
        np.testing.assert_allclose(s.data, [[1.0, 0.0, 0.5, 0.5]] * 3)

    def test_invalid_channels(self):
        with pytest.raises(ValueError):
            SpatialAdapter(0)


class TestPanning:
    def test_linear_center(self):
        pe = SpatialPE(ConstantPE(1.0), method=SpatialLinear(0.0))
        s = pe.render(0, 4)
        np.testing.assert_allclose(s.data, 0.5, atol=1e-6)

    def test_linear_hard_right(self):
        s = SpatialPE(ConstantPE(1.0), method=SpatialLinear(90.0)).render(0, 4)
        np.testing.assert_allclose(s.data[:, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(s.data[:, 1], 1.0, atol=1e-6)

    def test_constant_power_center(self):
        s = SpatialPE(ConstantPE(1.0), method=SpatialConstantPower(0.0)).render(0, 4)
        np.testing.assert_allclose(s.data, np.sqrt(0.5), atol=1e-5)

    def test_modulated_azimuth(self):
        from pygmu2_tpu import PiecewisePE

        az = PiecewisePE([(0, -90.0), (100, 90.0)])
        s = SpatialPE(ConstantPE(1.0), method=SpatialLinear(az)).render(0, 100)

        assert s.data[0, 0] > 0.95  # fully left at start
        assert s.data[99, 1] > 0.93  # mostly right at end


class TestHRTF:
    def test_filename_nearest(self):
        assert SpatialHRTF.hrtf_filename_for(0, 0) == "H0e000a.wav"
        assert SpatialHRTF.hrtf_filename_for(-45, 0) == "H0e045a.wav"

    def test_binaural_asymmetry_and_mirror(self):
        right = SpatialPE(DiracPE(), method=SpatialHRTF(azimuth=90.0)).render(0, 256).data
        left = SpatialPE(DiracPE(), method=SpatialHRTF(azimuth=-90.0)).render(0, 256).data
        # right-side source: right ear louder
        assert np.abs(right[:, 1]).sum() > 2 * np.abs(right[:, 0]).sum()
        # mirrored azimuth swaps ears exactly
        np.testing.assert_allclose(left[:, 0], right[:, 1], atol=1e-6)
        np.testing.assert_allclose(left[:, 1], right[:, 0], atol=1e-6)

    def test_dynamic_position_rejected(self):
        with pytest.raises(ValueError):
            SpatialHRTF(azimuth=ConstantPE(0.0))

    def test_extent_includes_ir_tail(self):
        src = CropPE(ConstantPE(1.0), 0, 100)
        pe = SpatialPE(src, method=SpatialHRTF(azimuth=0.0))
        assert pe.extent().end > 100


class TestTralfam:
    def test_scrambles_but_keeps_energy_scale(self):
        # Like the reference, real(IFFT) of the phase-scrambled spectrum
        # doesn't preserve magnitudes exactly (Hermitian symmetry broken);
        # energy stays the same order and the waveform is decorrelated.
        sig = np.random.default_rng(0).uniform(-1, 1, 512).astype(np.float32)
        pe = TralfamPE(ArrayPE(sig), seed=1)
        y = pe.render(0, 512).data[:, 0]
        e_in = float((sig.astype(np.float64) ** 2).sum())
        e_out = float((y.astype(np.float64) ** 2).sum())
        assert 0.25 * e_in < e_out < 2.0 * e_in
        corr = np.corrcoef(sig, y)[0, 1]
        assert abs(corr) < 0.3  # phases scrambled

    def test_deterministic_by_seed(self):
        sig = np.random.default_rng(0).uniform(-1, 1, 256).astype(np.float32)
        a = TralfamPE(ArrayPE(sig), seed=7).render(0, 256).data
        b = TralfamPE(ArrayPE(sig), seed=7).render(0, 256).data
        np.testing.assert_array_equal(a, b)

    def test_normalize_peak(self):
        sig = np.random.default_rng(0).uniform(-1, 1, 256).astype(np.float32)
        y = TralfamPE(ArrayPE(sig), seed=1, normalize_peak=0.25).render(0, 256).data
        np.testing.assert_allclose(np.abs(y).max(), 0.25, atol=1e-5)

    def test_infinite_source_rejected(self):
        with pytest.raises(ValueError):
            TralfamPE(ConstantPE(1.0)).render(0, 16)


class TestTriggerRestart:
    def test_silence_before_first_trigger(self):
        trig = PeriodicTrigger(hz=SR / 100, phase=0.5)  # first event at 50
        src = ArrayPE(np.arange(1, 31, dtype=np.float32))  # 30 samples
        pe = TriggerRestartPE(trig, src)
        y = pe.render(0, 100).data[:, 0]
        np.testing.assert_allclose(y[:50], 0.0)
        np.testing.assert_allclose(y[50:80], np.arange(1, 31))
        np.testing.assert_allclose(y[80:], 0.0)  # clip ended

    def test_retrigger_restarts(self):
        trig = PeriodicTrigger(hz=SR / 20)  # every 20 samples
        src = ArrayPE(np.arange(1, 101, dtype=np.float32))
        pe = TriggerRestartPE(trig, src)
        y = pe.render(0, 60).data[:, 0]
        np.testing.assert_allclose(y[0:20], np.arange(1, 21))
        np.testing.assert_allclose(y[20:40], np.arange(1, 21))

    def test_state_carries_across_blocks(self):
        def build():
            trig = PeriodicTrigger(hz=SR / 1000)
            src = ArrayPE(np.arange(1, 501, dtype=np.float32))
            return TriggerRestartPE(trig, src)

        one = build().render(0, 600).data
        pe = build()
        parts = [pe.render(i * 150, 150).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one)

    def test_infinite_src_rejected(self):
        with pytest.raises(ValueError):
            TriggerRestartPE(PeriodicTrigger(hz=100.0), ConstantPE(1.0)).render(0, 8)


class TestRandomSelect:
    def test_selects_and_plays(self):
        trig = PeriodicTrigger(hz=SR / 50)
        a = ArrayPE(np.full(30, 1.0, np.float32))
        b = ArrayPE(np.full(30, 2.0, np.float32))
        pe = RandomSelectPE(trig, [a, b], seed=3)
        y = pe.render(0, 200).data[:, 0]
        played = y[y != 0]
        assert set(np.unique(played)) <= {1.0, 2.0}
        assert len(played) > 0

    def test_weights_bias(self):
        trig = PeriodicTrigger(hz=SR / 10)
        a = ArrayPE(np.full(10, 1.0, np.float32))
        b = ArrayPE(np.full(10, 2.0, np.float32))
        pe = RandomSelectPE(trig, [a, b], weights=[0.0, 1.0], seed=1)
        y = pe.render(0, 500).data[:, 0]
        assert np.all(y[y != 0] == 2.0)

    def test_deterministic_by_seed(self):
        def build(seed):
            trig = PeriodicTrigger(hz=SR / 25)
            srcs = [
                ArrayPE(np.full(20, float(v), np.float32)) for v in (1, 2, 3)
            ]
            return RandomSelectPE(trig, srcs, seed=seed)

        one = build(9).render(0, 400).data
        two = build(9).render(0, 400).data
        np.testing.assert_array_equal(one, two)


class TestReverseEcho:
    def test_runs_and_is_finite(self):
        src = CropPE(SinePE(frequency=440.0, amplitude=0.5), 0, 2000)
        pe = ReversePitchEchoPE(
            src, block_seconds=0.01, feedback=0.5, max_delay_seconds=0.1
        )
        y = pe.render(0, 4000).data
        assert np.isfinite(y).all()
        assert np.abs(y).max() > 0.0  # echo tail exists after source ends

    def test_block_invariance(self):
        def build():
            src = CropPE(NoisePE(seed=2), 0, 1500)
            return ReversePitchEchoPE(
                src, block_seconds=0.005, feedback=0.6, max_delay_seconds=0.05
            )

        one = build().render(0, 2000).data
        pe = build()
        parts = [pe.render(i * 500, 500).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)

    def test_reverse_playback_reverses_ramp(self):
        # Feed a ramp; with pitch 1 and no feedback, each completed block
        # is played back reversed under a Hann window.
        n_block = 128
        ramp = np.arange(1, 4 * n_block + 1, dtype=np.float32)
        pe = ReversePitchEchoPE(
            ArrayPE(ramp),
            block_seconds=n_block / SR,
            feedback=0.0,
            max_delay_seconds=0.01,
        )
        y = pe.render(0, 3 * n_block).data[:, 0]
        # second block plays the first block reversed * Hann
        pos = np.arange(n_block) / (n_block - 1)
        window = 0.5 - 0.5 * np.cos(2 * np.pi * pos)
        expect = ramp[:n_block][::-1] * window
        np.testing.assert_allclose(y[n_block : 2 * n_block], expect, atol=1e-3)


class TestMidiIn:
    def test_feed_and_drain_in_order(self):
        events = []
        pe = MidiInPE(port_name=None, callback=lambda s, m: events.append((s, m)))
        pe.feed("note_on_1")
        pe.render(0, 64)
        pe.feed("note_on_2")
        pe.render(64, 64)
        assert events == [(0, "note_on_1"), (64, "note_on_2")]

    def test_outputs_silence(self):
        pe = MidiInPE(port_name=None)
        s = pe.render(0, 32)
        assert s.channels == 1
        np.testing.assert_allclose(s.data, 0.0)


@pytest.mark.skipif(ref is None, reason="reference not available")
class TestParitySpatialTralfam:
    def test_pan_parity(self):
        ref.set_sample_rate(SR)
        pg.set_sample_rate(SR)
        sig = np.random.default_rng(1).uniform(-1, 1, 500).astype(np.float32)

        for method_name, az in [
            ("SpatialLinear", 30.0),
            ("SpatialConstantPower", -45.0),
        ]:
            ours = pg.SpatialPE(
                pg.ArrayPE(sig), method=getattr(pg, method_name)(az)
            ).render(0, 500).data
            theirs = ref.SpatialPE(
                ref.ArrayPE(sig), method=getattr(ref, method_name)(az)
            ).render(0, 500).data
            np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_hrtf_parity(self):
        ref.set_sample_rate(SR)
        pg.set_sample_rate(SR)
        sig = np.random.default_rng(2).uniform(-1, 1, 800).astype(np.float32)

        ours = pg.SpatialPE(
            pg.ArrayPE(sig), method=pg.SpatialHRTF(azimuth=40.0, elevation=10.0)
        ).render(0, 800).data
        theirs = ref.SpatialPE(
            ref.ArrayPE(sig), method=ref.SpatialHRTF(azimuth=40.0, elevation=10.0)
        ).render(0, 800).data
        np.testing.assert_allclose(ours, theirs, atol=2e-4)
