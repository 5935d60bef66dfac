#!/usr/bin/env python
"""Pre-warm the persistent XLA compile cache for the benchmark programs.

First compiles of the big fused programs take minutes through a remote
compiler (see COMPILE.md); the cache at ~/.cache/pygmu2_tpu_xla (or
$PYGMU2_TPU_CACHE) makes warm runs fast. Run this once per
machine/toolchain before benchmarking or demoing:

    python scripts/warm_cache.py            # bench programs (default)
    python scripts/warm_cache.py --examples # + every example graph

Prints per-program wall time so it doubles as a compile-time report.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed(label: str, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"  {label:<44s} {dt:7.1f} s", flush=True)
    return dt


def warm_bench():
    import numpy as np

    import bench
    from pygmu2_tpu.soundfont.offline import render_midi_offline

    print("bench programs:", flush=True)

    def small():
        synth, midi = bench.build_workload()
        out = render_midi_offline(synth, midi, 3.0)
        assert np.isfinite(out).all()

    def small_i16():
        synth, midi = bench.build_workload()
        render_midi_offline(synth, midi, 3.0, wire="int16")

    def large():
        synth, midi = bench.build_workload(large_font=True)
        out = render_midi_offline(synth, midi, 3.0)
        assert np.isfinite(out).all()

    def large_i16():
        synth, midi = bench.build_workload(large_font=True)
        render_midi_offline(synth, midi, 3.0, wire="int16")

    _timed("small font fused render (f32)", small)
    _timed("small font fused render (int16 wire)", small_i16)
    _timed("large font windowed-DMA render (f32)", large)
    _timed("large font windowed-DMA render (int16 wire)", large_i16)


def warm_examples():
    import subprocess

    ex_dir = Path(__file__).resolve().parent.parent / "examples"
    print("examples:", flush=True)
    for path in sorted(ex_dir.glob("[0-9]*.py")):
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, str(path)],
            capture_output=True,
            timeout=1200,
            cwd=str(ex_dir.parent),
        )
        dt = time.perf_counter() - t0
        status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
        print(f"  {path.name:<44s} {dt:7.1f} s  {status}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", action="store_true",
                    help="also run every example graph")
    args = ap.parse_args()
    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    warm_bench()
    if args.examples:
        warm_examples()


if __name__ == "__main__":
    main()
