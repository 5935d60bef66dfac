"""Shared helpers for the examples.

Each example builds a graph and bounces it to a WAV (pass ``--play`` to
also play through the audio device when one exists). Equivalent scripts
in the reference live under its examples/ directory.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pygmu2_tpu as pg  # noqa: E402

pg.set_sample_rate(44100)
SAMPLE_RATE = 44100


def finish(graph, name: str) -> None:
    """Render the graph's extent to /tmp/<name>.wav (and play with --play)."""
    out = f"/tmp/{name}.wav"
    pg.render_to_file(graph, out)
    print(f"wrote {out}")
    if "--play" in sys.argv:
        pg.play(graph)


def make_drum_wav(path: str | None = None, seconds: float = 0.6) -> str:
    """Synthesize a short percussion-ish sample to a WAV file.

    The reference examples ship recorded WAVs (djembe.wav, faun.wav);
    this mirror strips large assets, so file-based examples bounce a
    synthetic hit first and read it back — same code paths exercised.
    """
    import numpy as np

    if path is None:
        path = "/tmp/pygmu2_tpu_drum.wav"
    n = int(seconds * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    rng = np.random.default_rng(7)
    body = np.sin(2 * np.pi * (80.0 + 60.0 * np.exp(-t * 18.0)) * t)
    snap = rng.standard_normal(n) * np.exp(-t * 40.0) * 0.4
    data = ((body * np.exp(-t * 6.0) + snap) * 0.7).astype(np.float32)
    graph = pg.ArrayPE(data[:, None])
    pg.render_to_file(graph, path)
    return path
