"""Playback / offline-render conveniences.

TPU-native rebuild of the reference utils module (reference:
src/pygmu2/utils.py:34-150): ``render_to_file``, ``play``,
``play_offline``, ``browse``. Offline rendering uses the scan fast path —
one XLA launch for the whole piece — rather than the reference's single
giant ``render()`` call.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from pygmu2_tpu.core import engine
from pygmu2_tpu.core.config import get_sample_rate
from pygmu2_tpu.core.processing_element import ProcessingElement
from pygmu2_tpu.core.renderer import NullRenderer
from pygmu2_tpu.utils import wavio


def _resolve_sample_rate(sample_rate: int | None) -> int:
    if sample_rate is not None:
        return int(sample_rate)
    sr = get_sample_rate()
    if sr is None:
        raise RuntimeError(
            "Sample rate not set. Call pg.set_sample_rate() or pass sample_rate."
        )
    return int(sr)


def render_to_array(
    source: ProcessingElement,
    *,
    extent=None,
    block: int = 16384,
    bindings: dict | None = None,
) -> np.ndarray:
    """Render the source's full (finite) extent to a host float32 array.

    Validates the graph, runs lifecycle hooks, and scan-renders in one
    device launch. ``bindings`` supplies values for any ``ParamPE``
    nodes in the graph (jit arguments — re-binding never recompiles).
    """
    if extent is None:
        extent = source.extent()
    if extent.start is None or extent.end is None:
        raise RuntimeError("Cannot render: source has infinite extent.")
    renderer = NullRenderer(sample_rate=source.sample_rate or 44100)
    renderer.set_source(source)
    with renderer:
        renderer.start()
        out = engine.render_scan(
            source, extent.start, extent.end - extent.start, block,
            bindings=bindings,
        )
        return np.asarray(out)


def render_to_file(
    source: ProcessingElement,
    out_path: str,
    *,
    sample_rate: int | None = None,
    extent=None,
) -> None:
    """Render a finite PE graph to a WAV file as fast as possible."""
    sr = _resolve_sample_rate(sample_rate)
    data = render_to_array(source, extent=extent)
    wavio.write_wav(out_path, data, sr, fmt="float32")


def play(source: ProcessingElement, sample_rate: int | None = None) -> None:
    """Play a PE in real time through the audio device."""
    from pygmu2_tpu.core.audio_renderer import AudioRenderer

    sr = _resolve_sample_rate(sample_rate)
    renderer = AudioRenderer(sample_rate=sr)
    renderer.set_source(source)
    with renderer:
        renderer.start()
        renderer.play_extent()


def play_offline(
    source: ProcessingElement,
    sample_rate: int | None = None,
    path: str | None = None,
    omit_playback: bool | None = None,
) -> None:
    """Render to a WAV file offline, then play it back.

    With ``path=None`` a temp file is used and removed afterwards.
    """
    sr = _resolve_sample_rate(sample_rate)
    extent = source.extent()
    if extent.start is None or extent.end is None:
        raise RuntimeError("Cannot render offline: source has infinite extent.")

    if path is None:
        fd, tmp_path = tempfile.mkstemp(suffix=".wav")
        os.close(fd)
        try:
            render_to_file(source, tmp_path, sample_rate=sr, extent=extent)
            if omit_playback is not True:
                from pygmu2_tpu.models.io_pes import WavReaderPE

                play(WavReaderPE(tmp_path), sample_rate=sr)
        finally:
            try:
                os.remove(tmp_path)
            except FileNotFoundError:
                pass
    else:
        render_to_file(source, path, sample_rate=sr, extent=extent)
        if omit_playback is not True:
            from pygmu2_tpu.models.io_pes import WavReaderPE

            play(WavReaderPE(path), sample_rate=sr)


def browse(
    source: ProcessingElement,
    sample_rate: int | None = None,
    path: str | None = None,
) -> None:
    """Render to a WAV file and open it in the jog/shuttle player
    (separate process; returns immediately)."""
    import subprocess
    from pathlib import Path

    sr = _resolve_sample_rate(sample_rate)
    extent = source.extent()
    if extent.start is None or extent.end is None:
        raise RuntimeError("Cannot browse: source has infinite extent.")

    delete_on_close = path is None
    if path is None:
        fd, path = tempfile.mkstemp(suffix=".wav")
        os.close(fd)
    path = str(Path(path).resolve())
    render_to_file(source, path, sample_rate=sr, extent=extent)

    script_path = Path(__file__).resolve().parents[2] / "scripts" / "jogshuttle.py"
    if not script_path.exists():
        raise FileNotFoundError(
            "scripts/jogshuttle.py not found — run from the pygmu2_tpu source tree"
        )
    cmd = ["python", str(script_path), path]
    if delete_on_close:
        cmd.append("--delete-on-close")
    subprocess.Popen(cmd)
