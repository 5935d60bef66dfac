"""Per-PE error paths, channel negotiation, and LENIENT-mode behaviors.

Reference pattern: every PE's test file exercises its validation errors
alongside rendering (reference CONTRIBUTING.md:419-457); this suite
concentrates the error-path side so each raise site in models/ has a
test that triggers it, plus the Renderer's graph validation (impure
multi-sink, channel resolution) and the STRICT/LENIENT error policy
(core/config.handle_error).
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core.config import ErrorMode, set_error_mode

SR = 44100


@pytest.fixture(autouse=True)
def _sr():
    pg.set_sample_rate(SR)
    yield
    set_error_mode(ErrorMode.STRICT)


def mono(n=256, v=0.25):
    return pg.ArrayPE(np.full((n, 1), v, np.float32))


def stereo(n=256, v=0.25):
    return pg.ArrayPE(np.full((n, 2), v, np.float32))


# ---- constructor validation ---------------------------------------------


class TestArrayPE:
    def test_rejects_3d(self):
        with pytest.raises(ValueError, match="1D or 2D"):
            pg.ArrayPE(np.zeros((2, 2, 2), np.float32))

    def test_rejects_empty(self):
        with pytest.raises(ValueError, match="empty"):
            pg.ArrayPE(np.zeros((0,), np.float32))


class TestMixPE:
    def test_requires_two_inputs(self):
        with pytest.raises(ValueError, match="at least 2"):
            pg.MixPE([mono()])

    def test_channel_mismatch_rejected_at_resolution(self):
        pe = pg.MixPE([mono(), stereo()])
        with pytest.raises(ValueError, match="channel mismatch"):
            pe.resolve_channel_count([1, 2])


class TestConvolvePE:
    def test_infinite_fir_rejected(self):
        with pytest.raises(ValueError, match="finite"):
            pg.ConvolvePE(mono(), pg.ConstantPE(1.0))

    def test_fir_must_start_at_zero(self):
        fir = pg.CropPE(pg.ConstantPE(1.0), 10, 20)
        with pytest.raises(ValueError, match="start at 0"):
            pg.ConvolvePE(mono(), fir)

    def test_fft_size_smaller_than_fir(self):
        fir = pg.CropPE(pg.ConstantPE(1.0), 0, 64)
        with pytest.raises(ValueError, match="fft_size"):
            pg.ConvolvePE(mono(), fir, fft_size=32)

    def test_channel_mismatch_at_trace(self):
        fir = pg.ArrayPE(np.ones((8, 3), np.float32))
        pe = pg.ConvolvePE(stereo(), fir)
        with pytest.raises(ValueError, match="channels"):
            pe.render(0, 64)


class TestReverbPE:
    def _ir(self):
        return pg.CropPE(pg.ConstantPE(1.0), 0, 64)

    def test_mix_out_of_range(self):
        with pytest.raises(ValueError, match="mix"):
            pg.ReverbPE(mono(), self._ir(), mix=1.5)

    def test_mix_pe_must_be_mono(self):
        with pytest.raises(ValueError, match="mono"):
            pg.ReverbPE(mono(), self._ir(), mix=stereo()).render(0, 64)


class TestSVFilterPE:
    def test_allpass_unsupported(self):
        with pytest.raises(ValueError, match="ALLPASS"):
            pg.SVFilterPE(mono(), 1000.0, 0.7, mode=pg.BiquadMode.ALLPASS)


class TestSlewLimiterPE:
    def test_rise_rate_positive(self):
        with pytest.raises(ValueError, match="rise_rate"):
            pg.SlewLimiterPE(mono(), rise_rate=0.0)

    def test_fall_rate_positive(self):
        with pytest.raises(ValueError, match="fall_rate"):
            pg.SlewLimiterPE(mono(), rise_rate=1.0, fall_rate=-1.0)


class TestNoisePE:
    def test_min_max_order(self):
        with pytest.raises(ValueError, match="max_value"):
            pg.NoisePE(min_value=1.0, max_value=-1.0)


class TestFunctionGenPE:
    def test_unknown_waveform(self):
        with pytest.raises(ValueError, match="waveform"):
            pg.FunctionGenPE(frequency=100.0, waveform="triangle")

    def test_channels_positive(self):
        with pytest.raises(ValueError, match="channels"):
            pg.FunctionGenPE(frequency=100.0, channels=0)


class TestKarplusStrongPE:
    def test_frequency_positive(self):
        with pytest.raises(ValueError, match="frequency"):
            pg.KarplusStrongPE(frequency=0.0)

    def test_rho_in_range(self):
        with pytest.raises(ValueError, match="rho"):
            pg.KarplusStrongPE(frequency=220.0, rho=1.5)

    def test_amplitude_positive(self):
        with pytest.raises(ValueError, match="amplitude"):
            pg.KarplusStrongPE(frequency=220.0, amplitude=-0.1)


class TestLoopPE:
    def test_negative_crossfade(self):
        with pytest.raises(ValueError, match="crossfade"):
            pg.LoopPE(mono(), crossfade_seconds=-0.1)

    def test_infinite_source_needs_loop_end(self):
        with pytest.raises(ValueError, match="infinite"):
            pg.LoopPE(pg.ConstantPE(1.0))

    def test_empty_loop_rejected(self):
        with pytest.raises(ValueError, match="positive"):
            pg.LoopPE(mono(), loop_start=100, loop_end=100)


class TestSlicePE:
    def test_negative_duration(self):
        with pytest.raises(ValueError, match="duration"):
            pg.SlicePE(mono(), 0, -5)


class TestSequencePE:
    def test_requires_items(self):
        with pytest.raises(ValueError, match="at least one"):
            pg.SequencePE([])

    def test_items_must_be_pairs(self):
        with pytest.raises(ValueError, match="pair"):
            pg.SequencePE([mono()])


class TestPiecewisePE:
    def test_requires_points(self):
        with pytest.raises(ValueError, match="at least one"):
            pg.PiecewisePE([])

    def test_channels_positive(self):
        with pytest.raises(ValueError, match="channels"):
            pg.PiecewisePE([(0, 0.0), (100, 1.0)], channels=0)


class TestPortamentoPE:
    def test_empty_notes(self):
        with pytest.raises(ValueError, match="notes"):
            pg.PortamentoPE([])


class TestSpatial:
    def test_adapter_channels_positive(self):
        with pytest.raises(ValueError, match="channels"):
            pg.SpatialAdapter(0)

    def test_hrtf_rejects_dynamic_angles(self):
        with pytest.raises(ValueError, match="static"):
            pg.SpatialHRTF(pg.ConstantPE(10.0))

    def test_spatial_requires_method(self):
        with pytest.raises(ValueError, match="method"):
            pg.SpatialPE(mono(), method=None)

    def test_spatial_method_type_checked(self):
        with pytest.raises(TypeError, match="SpatialMethod"):
            pg.SpatialPE(mono(), method="linear")


class TestTralfamPE:
    def test_normalize_peak_positive(self):
        with pytest.raises(ValueError, match="normalize_peak"):
            pg.TralfamPE(mono(), normalize_peak=0.0)

    def test_infinite_source_rejected_at_render(self):
        pe = pg.TralfamPE(pg.ConstantPE(0.5))
        with pytest.raises(ValueError, match="finite"):
            pe.render(0, 64)


class TestTriggerRestart:
    def test_infinite_source_rejected(self):
        pe = pg.TriggerRestartPE(pg.PeriodicTrigger(2.0), pg.ConstantPE(1.0))
        with pytest.raises(ValueError, match="finite"):
            pe.render(0, 64)


class TestRandomSelectPE:
    def test_requires_inputs(self):
        with pytest.raises(ValueError, match="at least one"):
            pg.RandomSelectPE(pg.PeriodicTrigger(2.0), [])

    def test_weights_length(self):
        with pytest.raises(ValueError, match="weights"):
            pg.RandomSelectPE(
                pg.PeriodicTrigger(2.0), [mono(), mono()], weights=[1.0]
            )

    def test_channel_mismatch(self):
        pe = pg.RandomSelectPE(pg.PeriodicTrigger(2.0), [mono(), stereo()])
        with pytest.raises(ValueError, match="mismatch"):
            pe.resolve_channel_count([1, 1, 2])


class TestGates:
    def test_periodic_trigger_hz_positive(self):
        with pytest.raises(ValueError, match="hz"):
            pg.PeriodicTrigger(-1.0)

    def test_periodic_trigger_period_underflow(self):
        with pytest.raises(ValueError, match="period"):
            pg.PeriodicTrigger(1e9)

    def test_gate_validation_rejects_non_binary(self, monkeypatch):
        from pygmu2_tpu.models import gates

        monkeypatch.setattr(gates.GateSignal, "VALIDATE_FULL", True)

        class BadGate(gates.GateSignal):
            def inputs(self):
                return []

            def channel_count(self):
                return 1

            def _compute_extent(self):
                return pg.Extent(0, None)

            def _trace_gate(self, ctx):
                import jax.numpy as jnp

                return jnp.full((ctx.duration, 1), 0.5)

        with pytest.raises(ValueError, match="outside"):
            BadGate().render(0, 64)

    def test_trigger_validation_rejects_fractional(self, monkeypatch):
        from pygmu2_tpu.models import gates

        monkeypatch.setattr(gates.TriggerSignal, "VALIDATE_FULL", True)

        class BadTrig(gates.TriggerSignal):
            def inputs(self):
                return []

            def channel_count(self):
                return 1

            def _compute_extent(self):
                return pg.Extent(0, None)

            def _trace_trigger(self, ctx):
                import jax.numpy as jnp

                return jnp.full((ctx.duration, 1), 0.5)

        with pytest.raises(ValueError, match="non-integer"):
            BadTrig().render(0, 64)


class TestWavetablePE:
    def test_infinite_wavetable_rejected(self):
        pe = pg.WavetablePE(pg.ConstantPE(0.3), mono(64))
        with pytest.raises(ValueError, match="finite"):
            pe.render(0, 64)


class TestTransformPE:
    def test_shape_changing_func_rejected(self):
        pe = pg.TransformPE(mono(), lambda x: x[: x.shape[0] // 2])
        with pytest.raises(ValueError, match="shape"):
            pe.render(0, 64)


class TestCropPE:
    def test_negative_duration(self):
        with pytest.raises(ValueError, match="duration"):
            pg.CropPE(mono(), 0, -1)


# ---- graph validation through the Renderer ------------------------------


class TestGraphValidation:
    def _render(self, graph):
        r = pg.NullRenderer()
        r.set_source(graph)  # validation happens here
        r.start()
        try:
            r.render(0, 64)
        finally:
            r.stop()

    def test_impure_multi_sink_rejected(self):
        shared = pg.BiquadPE(mono(), 1000.0, 0.7)  # stateful
        graph = pg.MixPE([shared, pg.GainPE(shared, 0.5)])
        r = pg.NullRenderer()
        with pytest.raises(ValueError, match="multiple sinks"):
            r.set_source(graph)

    def test_pure_multi_sink_allowed(self):
        shared = pg.SinePE(frequency=440.0)  # pure
        graph = pg.MixPE([shared, pg.GainPE(shared, 0.5)])
        self._render(graph)

    def test_mix_channel_mismatch_rejected_at_trace(self):
        # channel_count() reports the first input (reference-compatible),
        # so the static validator passes; the mismatch must be caught at
        # trace instead of broadcasting silently.
        graph = pg.MixPE([mono(), stereo()])
        with pytest.raises(ValueError, match="channel mismatch"):
            graph.render(0, 64)


# ---- STRICT / LENIENT error policy --------------------------------------


class TestErrorModes:
    def test_strict_raises_on_double_start(self):
        set_error_mode(ErrorMode.STRICT)
        r = pg.NullRenderer()
        r.set_source(mono())
        r.start()
        try:
            with pytest.raises(RuntimeError, match="Already started"):
                r.start()
        finally:
            r.stop()

    def test_lenient_warns_and_continues_on_double_start(self, caplog):
        set_error_mode(ErrorMode.LENIENT)
        r = pg.NullRenderer()
        r.set_source(mono())
        r.start()
        try:
            r.start()  # must not raise in LENIENT mode
        finally:
            r.stop()
            set_error_mode(ErrorMode.STRICT)

    def test_missing_source_is_fatal_even_lenient(self):
        set_error_mode(ErrorMode.LENIENT)
        r = pg.NullRenderer()
        with pytest.raises(RuntimeError, match="No source"):
            r.start()

    def test_lenient_set_source_while_started(self):
        set_error_mode(ErrorMode.LENIENT)
        r = pg.NullRenderer()
        r.set_source(mono())
        r.start()
        try:
            r.set_source(mono())  # warn + continue
        finally:
            r.stop()

    def test_strict_set_source_while_started(self):
        set_error_mode(ErrorMode.STRICT)
        r = pg.NullRenderer()
        r.set_source(mono())
        r.start()
        try:
            with pytest.raises(RuntimeError, match="Cannot set source"):
                r.set_source(mono())
        finally:
            r.stop()

    def test_sample_rate_conflict_lenient_picks_first(self):
        set_error_mode(ErrorMode.LENIENT)
        a = pg.ArrayPE(np.zeros((8, 1), np.float32))
        b = pg.ArrayPE(np.zeros((8, 1), np.float32))
        a._sample_rate = 44100
        b._sample_rate = 48000
        mix = pg.MixPE([a, b])
        mix._sample_rate = None
        assert mix.sample_rate == 44100

    def test_sample_rate_conflict_strict_raises(self):
        set_error_mode(ErrorMode.STRICT)
        a = pg.ArrayPE(np.zeros((8, 1), np.float32))
        b = pg.ArrayPE(np.zeros((8, 1), np.float32))
        a._sample_rate = 44100
        b._sample_rate = 48000
        mix = pg.MixPE([a, b])
        mix._sample_rate = None
        with pytest.raises(RuntimeError, match="conflicting"):
            mix.sample_rate
