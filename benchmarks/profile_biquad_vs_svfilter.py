#!/usr/bin/env python3
"""Profile BiquadPE vs SVFilterPE using the Renderer's built-in profiling.

Builds two equivalent autowah-style graphs (envelope -> freq control ->
lowpass filter), one with BiquadPE and one with SVFilterPE, renders the
same extent with NullRenderer + enable_profiling(), and prints both
reports plus a head-to-head total.

On the reference (CPU/Numba) the interesting question is per-sample
kernel cost; on TPU both filters compile to the same blocked
linear-recurrence scan (ops.linrec / ops.linrec_pallas), so the
comparison mostly measures coefficient-computation cost and confirms
neither regresses. Run from the project root:

    python benchmarks/profile_biquad_vs_svfilter.py

Reference counterpart: benchmarks/profile_biquad_vs_svfilter.py:1-130.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygmu2_tpu as pg  # noqa: E402

SAMPLE_RATE = 44100
DURATION_SECONDS = 8
BLOCK_SIZE = 1024


def envelope_to_freq(env):
    """Map envelope (0-1) to frequency (100-3000 Hz).

    TransformPE funcs are traced, so use jnp (design divergence from the
    reference, whose TransformPE applies numpy eagerly per block).
    """
    import jax.numpy as jnp

    env = jnp.clip(env, 0, 1)
    return 100.0 + (3000.0 - 100.0) * (env ** 0.5)


def make_graph(filter_cls):
    source = pg.SinePE(frequency=220.0, amplitude=0.8)
    envelope = pg.EnvelopePE(
        source, attack=0.005, release=0.05, mode=pg.DetectionMode.PEAK
    )
    freq_control = pg.TransformPE(envelope, func=envelope_to_freq)
    filtered = filter_cls(
        source, frequency=freq_control, q=10.0, mode=pg.BiquadMode.LOWPASS
    )
    return pg.GainPE(filtered, gain=1.0)


def run_profiled(renderer, root_pe, duration_samples):
    cropped = pg.CropPE(root_pe, 0, duration_samples)
    renderer.set_source(cropped)
    renderer.start()
    num_blocks = (duration_samples + BLOCK_SIZE - 1) // BLOCK_SIZE
    for i in range(num_blocks):
        start = i * BLOCK_SIZE
        duration = min(BLOCK_SIZE, duration_samples - start)
        if duration <= 0:
            break
        renderer.render(start, duration)
    renderer.stop()


def main():
    pg.set_sample_rate(SAMPLE_RATE)
    duration_samples = int(DURATION_SECONDS * SAMPLE_RATE)
    renderer = pg.NullRenderer(sample_rate=SAMPLE_RATE)

    print("Profiling BiquadPE vs SVFilterPE (autowah-style graph)")
    print(f"  Sample rate: {SAMPLE_RATE}, duration: {DURATION_SECONDS}s, "
          f"block size: {BLOCK_SIZE}")

    reports = {}
    for name, cls in (("BiquadPE", pg.BiquadPE), ("SVFilterPE", pg.SVFilterPE)):
        print("=" * 70)
        print(f"RUN: {name} (envelope -> freq -> {name} lowpass)")
        print("=" * 70)
        renderer.enable_profiling()
        run_profiled(renderer, make_graph(cls), duration_samples)
        renderer.print_profile_report()
        reports[name] = renderer.get_profile_report()

    bq, sv = reports["BiquadPE"], reports["SVFilterPE"]
    if bq and sv:
        t_bq_ms = bq.total_render_time_ns / 1e6
        t_sv_ms = sv.total_render_time_ns / 1e6
        print()
        print("COMPARISON (total render time)")
        print("-" * 70)
        print(f"  BiquadPE:   {t_bq_ms:>10.2f} ms")
        print(f"  SVFilterPE: {t_sv_ms:>10.2f} ms")
        if t_bq_ms > 0:
            print(f"  Ratio (SVF/Biquad): {t_sv_ms / t_bq_ms:.2f}x")


if __name__ == "__main__":
    main()
