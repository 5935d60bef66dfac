"""Renderer validation, lifecycle, error modes and profiling contracts.

Mirrors the reference's tests/test_renderer.py coverage
(reference: renderer.py:351-479, config.py:44-109)."""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core.config import ErrorMode, get_error_mode, set_error_mode


class _StatefulDummy(pg.ProcessingElement):
    def __init__(self, source):
        self._source = source

    def inputs(self):
        return [self._source]

    def is_pure(self):
        return False

    def channel_count(self):
        return None

    def _trace(self, ctx):
        return ctx.pull(self._source)


class _Lifecycle(pg.ProcessingElement):
    def __init__(self, source, log, name):
        self._source = source
        self._log = log
        self._name = name

    def inputs(self):
        return [self._source]

    def is_pure(self):
        return True

    def channel_count(self):
        return None

    def on_start(self):
        self._log.append(("start", self._name))

    def on_stop(self):
        self._log.append(("stop", self._name))

    def _trace(self, ctx):
        return ctx.pull(self._source)


class TestValidation:
    def test_pure_multi_sink_allowed(self):
        src = pg.SinePE(frequency=440.0)
        graph = pg.MixPE(pg.GainPE(src, 0.5), pg.GainPE(src, 0.25))
        r = pg.NullRenderer()
        r.set_source(graph)  # no raise

    def test_impure_multi_sink_raises(self):
        src = _StatefulDummy(pg.SinePE(frequency=440.0))
        graph = pg.MixPE(pg.GainPE(src, 0.5), pg.GainPE(src, 0.25))
        r = pg.NullRenderer()
        with pytest.raises(ValueError, match="multiple sinks"):
            r.set_source(graph)

    def test_cache_pe_legalizes_fan_out(self):
        src = pg.CachePE(_StatefulDummy(pg.SinePE(frequency=440.0)))
        graph = pg.MixPE(pg.GainPE(src, 0.5), pg.GainPE(src, 0.25))
        pg.NullRenderer().set_source(graph)  # no raise

    def test_diamond_graph_renders(self):
        src = pg.SinePE(frequency=220.0, amplitude=0.5)
        a = pg.GainPE(src, 0.5)
        b = pg.DelayPE(src, 10)
        graph = pg.MixPE(a, b)
        with pg.NullRenderer() as r:
            r.set_source(graph)
            r.start()
            out = r.render_extent(0, 256)
        assert out.data.shape[0] == 256 and np.isfinite(out.data).all()

    def test_render_before_start_raises(self):
        r = pg.NullRenderer()
        r.set_source(pg.SinePE(frequency=440.0))
        with pytest.raises(Exception):
            r.render(0, 64)

    def test_negative_duration_raises(self):
        pe = pg.SinePE(frequency=440.0)
        with pytest.raises(Exception):
            pe.render(0, -1)

    def test_duration_zero_empty(self):
        snip = pg.SinePE(frequency=440.0).render(0, 0)
        assert snip.data.shape[0] == 0


class TestLifecycle:
    def test_start_bottom_up_stop_top_down(self):
        log = []
        inner = _Lifecycle(pg.SinePE(frequency=440.0), log, "inner")
        outer = _Lifecycle(inner, log, "outer")
        with pg.NullRenderer() as r:
            r.set_source(outer)
            r.start()
            assert log == [("start", "inner"), ("start", "outer")]
            r.render(0, 64)
        assert log[-2:] == [("stop", "outer"), ("stop", "inner")]


class TestErrorModes:
    def test_lenient_warns_instead_of_raising(self):
        prev = get_error_mode()
        try:
            set_error_mode(ErrorMode.LENIENT)
            r = pg.NullRenderer()
            r.set_source(pg.SinePE(frequency=440.0))
            r.start()
            r.start()  # double start: raises in STRICT, warns in LENIENT
            r.stop()
        finally:
            set_error_mode(prev)

    def test_strict_raises(self):
        prev = get_error_mode()
        try:
            set_error_mode(ErrorMode.STRICT)
            r = pg.NullRenderer()
            r.set_source(pg.SinePE(frequency=440.0))
            r.start()
            with pytest.raises(Exception):
                r.start()
            r.stop()
        finally:
            set_error_mode(prev)


class TestProfiling:
    def test_profile_report_counts(self):
        graph = pg.GainPE(pg.SinePE(frequency=440.0), 0.5)
        with pg.NullRenderer() as r:
            r.set_source(graph)
            r.enable_profiling()
            r.start()
            r.render(0, 512)
            r.render(512, 512)
        report = r.get_profile_report()
        assert report is not None
        text = report.summary()
        assert "GainPE" in text or "SinePE" in text
