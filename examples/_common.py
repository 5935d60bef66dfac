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
