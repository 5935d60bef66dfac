"""Renderer lifecycle + config-policy coverage at reference breadth.

Mirrors the behaviors of reference tests/test_renderer.py:134-588 and
tests/test_config.py:21-200 that weren't already covered by
test_renderer_contracts.py / test_error_paths.py: lifecycle flags,
start/stop ordering guarantees, context-manager semantics, profiling
report internals, handle_error dispatch, and NullRenderer basics.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import ArrayPE, ConstantPE, GainPE, MixPE, SinePE
from pygmu2_tpu.core.config import ErrorMode, get_error_mode, handle_error, set_error_mode
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement
from pygmu2_tpu.core.renderer import NullRenderer, PEProfile, ProfileReport, Renderer
from pygmu2_tpu.core.snippet import Snippet


@pytest.fixture(autouse=True)
def _strict_mode():
    set_error_mode(ErrorMode.STRICT)
    yield
    set_error_mode(ErrorMode.STRICT)


class CollectingRenderer(Renderer):
    """Renderer that keeps every output snippet (test double)."""

    def __init__(self, sample_rate: int = 44100):
        super().__init__(sample_rate)
        self.snippets = []

    def _output(self, snippet):
        self.snippets.append(snippet)


class LifecycleProbePE(ProcessingElement):
    """Pure passthrough recording on_start/on_stop calls into a shared log."""

    def __init__(self, source, name, log):
        self._source = source
        self._name = name
        self._log = log

    def is_pure(self):
        return True

    def inputs(self):
        return [self._source] if self._source is not None else []

    def channel_count(self):
        return 1 if self._source is None else self._source.channel_count()

    def _compute_extent(self):
        return Extent() if self._source is None else self._source.extent()

    def _on_start(self):
        self._log.append(("start", self._name))

    def _on_stop(self):
        self._log.append(("stop", self._name))

    def _trace(self, ctx):
        if self._source is None:
            import jax.numpy as jnp

            return jnp.zeros((ctx.duration, 1), jnp.float32)
        return ctx.pull(self._source)


class TestRendererBasics:
    def test_create_has_no_source(self):
        r = NullRenderer(sample_rate=48000)
        assert r.source is None
        assert r.sample_rate == 48000
        assert r.started is False

    def test_default_sample_rate(self):
        assert NullRenderer().sample_rate == 44100

    def test_set_source_exposes_source_and_channels(self):
        r = NullRenderer()
        src = ConstantPE(0.5)
        r.set_source(src)
        assert r.source is src
        assert r.channel_count == 1

    def test_channel_count_none_before_set_source(self):
        assert NullRenderer().channel_count is None

    def test_render_without_source_raises(self):
        with pytest.raises(RuntimeError, match="No source"):
            NullRenderer().render(0, 10)

    def test_render_without_start_raises(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.5))
        with pytest.raises(RuntimeError, match="Not started"):
            r.render(0, 10)

    def test_render_zero_duration_raises(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.5))
        r.start()
        with pytest.raises(ValueError, match="duration >= 1"):
            r.render(0, 0)

    def test_render_outputs_snippet(self):
        r = CollectingRenderer()
        r.set_source(ConstantPE(0.25))
        r.start()
        r.render(10, 64)
        [s] = r.snippets
        assert isinstance(s, Snippet)
        assert s.start == 10 and s.duration == 64
        np.testing.assert_allclose(np.asarray(s.data), 0.25)

    def test_render_extent_returns_snippet(self):
        r = CollectingRenderer()
        r.set_source(ConstantPE(0.5))
        r.start()
        s = r.render_extent(0, 256, block=64)
        assert s.duration == 256
        np.testing.assert_allclose(np.asarray(s.data), 0.5)
        assert r.snippets[-1] is s

    def test_render_extent_without_source_raises(self):
        with pytest.raises(RuntimeError, match="No source"):
            NullRenderer().render_extent(0, 64)


class TestRendererLifecycle:
    def test_start_requires_source(self):
        with pytest.raises(RuntimeError, match="No source"):
            NullRenderer().start()

    def test_start_sets_started_flag(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.0))
        r.start()
        assert r.started is True

    def test_double_start_raises_strict(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.0))
        r.start()
        with pytest.raises(RuntimeError, match="Already started"):
            r.start()

    def test_stop_clears_started_flag(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.0))
        r.start()
        r.stop()
        assert r.started is False

    def test_stop_is_idempotent(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.0))
        r.start()
        r.stop()
        r.stop()  # no raise
        assert r.started is False

    def test_stop_before_start_is_noop(self):
        r = NullRenderer()
        r.stop()  # no raise
        assert r.started is False

    def test_set_source_while_started_raises_strict(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.0))
        r.start()
        with pytest.raises(RuntimeError, match="set source while started"):
            r.set_source(ConstantPE(1.0))

    def test_on_start_bottom_up_order(self):
        log = []
        a = LifecycleProbePE(None, "leaf", log)
        b = LifecycleProbePE(a, "mid", log)
        c = LifecycleProbePE(b, "root", log)
        r = NullRenderer()
        r.set_source(c)
        r.start()
        assert log == [("start", "leaf"), ("start", "mid"), ("start", "root")]

    def test_on_stop_top_down_order(self):
        log = []
        a = LifecycleProbePE(None, "leaf", log)
        b = LifecycleProbePE(a, "mid", log)
        c = LifecycleProbePE(b, "root", log)
        r = NullRenderer()
        r.set_source(c)
        r.start()
        log.clear()
        r.stop()
        assert log == [("stop", "root"), ("stop", "mid"), ("stop", "leaf")]

    def test_diamond_on_start_called_once(self):
        log = []
        leaf = LifecycleProbePE(None, "leaf", log)
        mixed = MixPE(GainPE(leaf, 0.5), GainPE(leaf, 0.25))
        r = NullRenderer()
        r.set_source(mixed)
        r.start()
        assert log.count(("start", "leaf")) == 1

    def test_context_manager_stops(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.0))
        with r:
            r.start()
            assert r.started
        assert r.started is False

    def test_context_manager_stops_on_exception(self):
        r = NullRenderer()
        r.set_source(ConstantPE(0.0))
        with pytest.raises(KeyError):
            with r:
                r.start()
                raise KeyError("boom")
        assert r.started is False

    def test_context_manager_returns_renderer(self):
        r = NullRenderer()
        with r as entered:
            assert entered is r

    def test_restart_after_stop(self):
        log = []
        pe = LifecycleProbePE(None, "x", log)
        r = NullRenderer()
        r.set_source(pe)
        r.start()
        r.stop()
        r.start()
        assert log == [("start", "x"), ("stop", "x"), ("start", "x")]
        r.stop()

    def test_set_new_source_after_stop(self):
        r = CollectingRenderer()
        r.set_source(ConstantPE(0.1))
        r.start()
        r.stop()
        r.set_source(ConstantPE(0.9))
        r.start()
        r.render(0, 8)
        np.testing.assert_allclose(np.asarray(r.snippets[-1].data), 0.9)


class TestGraphValidationEdges:
    def test_valid_chain_resolves_channels(self):
        r = NullRenderer()
        r.set_source(GainPE(GainPE(SinePE(frequency=440), 0.5), 0.5))
        assert r.channel_count == 1

    def test_stereo_chain_resolves_channels(self):
        r = NullRenderer()
        r.set_source(GainPE(ArrayPE(np.zeros((16, 2), np.float32)), 0.5))
        assert r.channel_count == 2

    def test_mix_channel_mismatch_raises_at_render(self):
        # MixPE reports its first input's channel count, so the static
        # validator passes; the mismatch is caught at trace time instead
        # (reference mix_pe.py:24-25 requires all inputs to match).
        mono = ConstantPE(0.1)
        stereo = ArrayPE(np.zeros((16, 2), np.float32))
        r = NullRenderer()
        r.set_source(MixPE(mono, stereo))
        r.start()
        with pytest.raises(ValueError, match="channel mismatch"):
            r.render(0, 8)

    def test_required_channel_mismatch_raises_at_set_source(self):
        # A PE that declares required_input_channels() fails fast in
        # set_source's validation pass.
        class MonoOnlyPE(LifecycleProbePE):
            def required_input_channels(self):
                return 1

        stereo = ArrayPE(np.zeros((16, 2), np.float32))
        r = NullRenderer()
        with pytest.raises(ValueError, match="requires 1 channel"):
            r.set_source(MonoOnlyPE(stereo, "m", []))

    def test_multi_level_reuse_pure(self):
        shared = SinePE(frequency=220)
        g1 = GainPE(shared, 0.5)
        top = MixPE(g1, GainPE(g1, 0.25), shared)
        r = NullRenderer()
        r.set_source(top)  # pure fan-out at two levels: legal
        assert r.channel_count == 1


class TestProfiling:
    def _run_profiled(self, n_blocks=4, dur=128):
        r = NullRenderer()
        r.set_source(GainPE(SinePE(frequency=440), 0.5))
        r.enable_profiling()
        r.start()
        for k in range(n_blocks):
            r.render(k * dur, dur)
        r.stop()
        return r

    def test_profiling_flag(self):
        r = NullRenderer()
        assert r.profiling is False
        r.enable_profiling()
        assert r.profiling is True
        r.disable_profiling()
        assert r.profiling is False

    def test_report_none_until_enabled(self):
        assert NullRenderer().get_profile_report() is None

    def test_report_counts(self):
        r = self._run_profiled(n_blocks=3, dur=100)
        rep = r.get_profile_report()
        assert rep.render_calls == 3
        assert rep.total_samples == 300
        assert rep.total_render_time_ns > 0

    def test_report_has_root_profile(self):
        r = self._run_profiled()
        rep = r.get_profile_report()
        [prof] = rep.pe_profiles.values()
        assert prof.pe_class == "GainPE"
        assert prof.render_count == 4
        assert prof.min_time_ns <= prof.max_time_ns

    def test_pe_profile_derived_metrics(self):
        p = PEProfile(pe_class="X", pe_id=1, render_count=2,
                      total_time_ns=2_000_000, total_samples=44100)
        assert p.total_time_ms == pytest.approx(2.0)
        assert p.avg_time_ms == pytest.approx(1.0)
        assert p.samples_per_second == pytest.approx(44100 / 2e-3)
        assert p.realtime_ratio(44100) == pytest.approx(500.0)

    def test_pe_profile_zero_time_metrics(self):
        p = PEProfile(pe_class="X", pe_id=1)
        assert p.avg_time_ms == 0.0
        assert p.samples_per_second == 0.0
        assert p.realtime_ratio() == 0.0

    def test_summary_mentions_classes_and_totals(self):
        r = self._run_profiled()
        s = r.get_profile_report().summary(44100)
        assert "GainPE" in s and "Realtime ratio" in s and "512" in s

    def test_disable_keeps_report(self):
        r = self._run_profiled()
        r.disable_profiling()
        assert r.get_profile_report() is not None

    def test_empty_report_summary(self):
        s = ProfileReport().summary()
        assert "Total render calls: 0" in s


class TestErrorModeEnum:
    def test_strict_value(self):
        assert ErrorMode.STRICT.value == "strict"

    def test_lenient_value(self):
        assert ErrorMode.LENIENT.value == "lenient"

    def test_default_is_strict(self):
        assert get_error_mode() is ErrorMode.STRICT

    def test_set_and_get(self):
        set_error_mode(ErrorMode.LENIENT)
        assert get_error_mode() is ErrorMode.LENIENT
        set_error_mode(ErrorMode.STRICT)
        assert get_error_mode() is ErrorMode.STRICT

    def test_exported_at_top_level(self):
        assert pg.ErrorMode is ErrorMode


class TestHandleError:
    def test_strict_mode_raises(self):
        with pytest.raises(RuntimeError, match="kaboom"):
            handle_error("kaboom")

    def test_lenient_mode_warns_and_continues(self, caplog):
        set_error_mode(ErrorMode.LENIENT)
        with caplog.at_level("WARNING"):
            assert handle_error("soft failure") is True
        assert "soft failure" in caplog.text

    def test_fatal_raises_in_strict(self):
        with pytest.raises(RuntimeError):
            handle_error("x", fatal=True)

    def test_fatal_raises_in_lenient(self):
        set_error_mode(ErrorMode.LENIENT)
        with pytest.raises(RuntimeError):
            handle_error("x", fatal=True)

    def test_custom_exception_class(self):
        with pytest.raises(ValueError, match="typed"):
            handle_error("typed", exception_class=ValueError)

    def test_custom_exception_class_when_fatal(self):
        set_error_mode(ErrorMode.LENIENT)
        with pytest.raises(TypeError):
            handle_error("typed", fatal=True, exception_class=TypeError)

    def test_override_mode_to_lenient(self, caplog):
        # global STRICT, per-call LENIENT: warns instead of raising
        with caplog.at_level("WARNING"):
            assert handle_error("per-call", error_mode=ErrorMode.LENIENT) is True

    def test_override_mode_to_strict(self):
        set_error_mode(ErrorMode.LENIENT)
        with pytest.raises(RuntimeError):
            handle_error("per-call", error_mode=ErrorMode.STRICT)


class TestNullRenderer:
    def test_creation(self):
        r = NullRenderer(sample_rate=22050)
        assert r.sample_rate == 22050

    def test_renders_silently(self):
        r = NullRenderer()
        r.set_source(SinePE(frequency=440))
        r.start()
        r.render(0, 512)  # output discarded, no raise
        r.stop()

    def test_drives_side_effects(self, tmp_path):
        from pygmu2_tpu import WavWriterPE
        from pygmu2_tpu.utils import wavio

        path = str(tmp_path / "side.wav")
        w = WavWriterPE(ConstantPE(0.5), path, subtype="FLOAT")
        r = NullRenderer()
        r.set_source(w)
        with r:
            r.start()
            r.render(0, 32)
        out, _ = wavio.read_wav(path)
        assert out.shape[0] == 32
