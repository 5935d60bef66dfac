#!/usr/bin/env python
"""Profile a whole piece: render a score graph with diagnostics + renderer
profiling enabled and print the reports.

Reference counterpart: scripts/profile_score.py. On TPU the per-node
attribution comes from jax.profiler traces (pass --trace DIR to dump one
for TensorBoard/Perfetto); the renderer report gives whole-graph wall
numbers.

Usage: python scripts/profile_score.py [--seconds 5] [--trace /tmp/trace]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_score(pg, seconds):
    sr = 44100
    notes = [57, 60, 64, 67, 69, 67, 64, 60]
    parts = []
    for i, n in enumerate(notes):
        f = float(pg.pitch_to_freq(n))
        pluck = pg.SlicePE(pg.KarplusStrongPE(f, rho=0.998, seed=i), 0, sr)
        parts.append((pluck, i * sr // 2))
    seq = pg.SequencePE(parts)
    pad = pg.SuperSawPE(55.0, voices=5, seed=1)
    sweep = pg.PiecewisePE([(0, 200.0), (seconds * sr, 4000.0)])
    bed = pg.GainPE(pg.LadderPE(pad, sweep, resonance=0.4), 0.2)
    return pg.CropPE(pg.MixPE(seq, bed), 0, seconds * sr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=int, default=5)
    parser.add_argument("--trace", type=str, default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import pygmu2_tpu as pg
    from pygmu2_tpu.core import diagnostics
    from pygmu2_tpu.core.renderer import NullRenderer

    pg.set_sample_rate(44100)
    graph = build_score(pg, args.seconds)

    renderer = NullRenderer()
    renderer.set_source(graph)
    renderer.enable_profiling()
    diagnostics.enable()

    with renderer:
        renderer.start()
        if args.trace:
            with jax.profiler.trace(args.trace):
                renderer.render_extent(0, args.seconds * 44100)
            print(f"jax profiler trace written to {args.trace}")
        else:
            # warm-up (compile), then a measured pass
            renderer.render_extent(0, args.seconds * 44100)
            renderer.render(0, args.seconds * 44100)

    renderer.print_profile_report()
    print()
    print(diagnostics.get_block_report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
