"""Every exported concrete PE must have a per-PE benchmark row.

The reference auto-discovers its benchmark set (reference:
benchmarks/benchmark_pes.py:75-105); here discovery is explicit, so this
test is what keeps the table complete: a newly exported PE without a
``build_configs`` row fails CI instead of silently dodging perf
regression (VERDICT r4 task 7).
"""

import importlib.util
import inspect
from pathlib import Path

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core import engine
from pygmu2_tpu.core.processing_element import ProcessingElement

# Abstract bases: exported for subclassing, not directly renderable.
ABSTRACT = {"SourcePE", "GateSignal", "TriggerSignal"}


def _load_configs():
    path = Path(__file__).resolve().parents[1] / "benchmarks" / "benchmark_pes.py"
    spec = importlib.util.spec_from_file_location("benchmark_pes", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build_configs(pg)


def _exported_pes():
    names = []
    for name in dir(pg):
        obj = getattr(pg, name)
        if (
            inspect.isclass(obj)
            and issubclass(obj, ProcessingElement)
            and obj is not ProcessingElement
            and name not in ABSTRACT
        ):
            names.append(name)
    return sorted(names)


def test_every_exported_pe_has_a_benchmark_row():
    pg.set_sample_rate(44100)
    configs = _load_configs()
    covered_classes = set()
    for build in configs.values():
        covered_classes.add(type(build()).__name__)
    missing = [n for n in _exported_pes() if n not in covered_classes]
    assert not missing, (
        f"exported PEs without a benchmarks/benchmark_pes.py row: {missing}"
    )


def test_abstract_set_is_actually_abstract():
    for name in ABSTRACT:
        obj = getattr(pg, name)
        assert inspect.isabstract(obj) or obj.__name__ == "SourcePE", name


@pytest.mark.parametrize("name", sorted(_load_configs()))
def test_benchmark_config_renders(name):
    pg.set_sample_rate(44100)
    pe = _load_configs()[name]()
    out = np.asarray(engine.render_scan(pe, 0, 2048, 1024))
    assert out.shape[0] == 2048
    assert np.isfinite(out).all()
