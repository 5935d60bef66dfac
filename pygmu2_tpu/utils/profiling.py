"""Device-level profiling helpers (jax.profiler wrappers).

Three layers of profiling exist in pygmu2_tpu, coarsest to finest:

1. ``Renderer.enable_profiling()`` — whole-graph wall time, realtime
   ratio (host-side; ``core/renderer.py``).
2. ``pygmu2_tpu.core.diagnostics`` — host-level pull counts and
   per-program timings (the analog of the reference's diagnostics
   module, reference: src/pygmu2/diagnostics.py:90-129).
3. This module — op-level device traces via ``jax.profiler``, viewable
   in TensorBoard (``tensorboard --logdir DIR``) or Perfetto
   (``ui.perfetto.dev`` on the generated ``.trace.json.gz``).

Typical use::

    import pygmu2_tpu as pg
    from pygmu2_tpu.utils.profiling import trace

    graph = pg.BiquadPE(pg.NoisePE(seed=1), 2000.0)
    with trace("/tmp/pygmu2_trace"):
        pg.render_to_array(graph, 0, 44100)

or, for a quick wall-time breakdown without a trace viewer::

    from pygmu2_tpu.utils.profiling import timed
    with timed("render"):
        pg.render_to_array(graph, 0, 44100)

The reference's profiling workflow (reference: OPTIMIZING.md:14-54)
iterates profile -> find hot PE -> optimize; the TPU workflow is
profile -> find hot *fusion/kernel* -> restructure (see the repo's
OPTIMIZING.md for the TPU-specific rules).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

from pygmu2_tpu.core.logger import get_logger

logger = get_logger(__name__)

__all__ = ["trace", "timed", "annotate", "block_until_done"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_trace: bool = True) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir``.

    View with TensorBoard's profile plugin or load the generated
    ``*.trace.json.gz`` into Perfetto. Wrap the *steady-state* part of
    a render (after the first compile) — tracing a compile produces a
    trace dominated by compilation.
    """
    import jax

    jax.profiler.start_trace(
        log_dir, create_perfetto_trace=create_perfetto_trace
    )
    try:
        yield
    finally:
        block_until_done()
        jax.profiler.stop_trace()
        logger.info("jax.profiler trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Label a region so it shows up named in the device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timed(label: str = "region") -> Iterator[None]:
    """Log the wall time of a block, synchronizing the device first.

    Forces a device sync *before and after* the block so the number is
    truthful on asynchronous-dispatch backends (see OPTIMIZING.md rule
    1b: timings before the first device-to-host transfer are fiction).
    """
    block_until_done()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        block_until_done()
        dt = time.perf_counter() - t0
        logger.info("%s: %.3f ms", label, dt * 1e3)


def block_until_done() -> None:
    """Synchronize all devices (safe to call on any backend)."""
    import jax

    try:
        for d in jax.devices():
            # a tiny transfer forces the queue to drain on remote targets
            jax.device_get(jax.device_put(0, d))
    except Exception:  # pragma: no cover - device enumeration failed
        pass
