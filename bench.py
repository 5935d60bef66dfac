#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: real-time factor (audio-seconds per wall-second) on one chip.
Baseline anchor: the reference's best committed number — the vectorized
meltysynth render at 12.37× realtime on CPU
(reference: benchmarks/README_MELTYSYNTH_BENCH.md:50-53; BASELINE.md #2).

Until the SoundFont engine lands, the benched workload is the heaviest
end-to-end graph currently supported: a 64-voice additive/filtered synth
graph (64 modulated sines → swept biquad → mix), 10 s @ 44.1 kHz,
scan-rendered in one XLA launch. vs_baseline = RTF / 12.37.

Run on the TPU (default backend); first run pays a one-time XLA compile
(persistent cache under ~/.cache/pygmu2_tpu_xla).
"""

import json
import sys
import time


def build_graph(pg, n_voices: int = 64):
    """64-voice detuned synth: sine stack → swept lowpass → soft clip."""
    voices = []
    for v in range(n_voices):
        freq = 110.0 * (1 + v % 16) * (1.0 + 0.0003 * v)
        voices.append(pg.SinePE(frequency=freq, amplitude=1.0 / n_voices))
    mix = pg.MixPE(voices)
    sweep = pg.PiecewisePE([(0, 400.0), (10 * 44100, 8000.0)])
    filt = pg.BiquadPE(mix, sweep, 2.0, mode=pg.BiquadMode.LOWPASS)
    import jax.numpy as jnp

    return pg.CropPE(pg.TransformPE(filt, jnp.tanh), 0, 10 * 44100)


def main():
    import jax

    import pygmu2_tpu as pg
    from pygmu2_tpu.core import engine

    pg.set_sample_rate(44100)
    seconds = 10
    total = seconds * 44100
    graph = build_graph(pg)

    # Warm-up (compile) run, then timed runs.
    out = engine.render_scan(graph, 0, total, 16384)
    jax.block_until_ready(out)

    runs = []
    for _ in range(5):
        graph2 = graph  # same program, state reset irrelevant (pure graph + filter state)
        t0 = time.perf_counter()
        out = engine.render_scan(graph2, 0, total, 16384)
        jax.block_until_ready(out)
        runs.append(time.perf_counter() - t0)
    wall = min(runs)
    rtf = seconds / wall
    msps = total / wall / 1e6

    print(
        json.dumps(
            {
                "metric": "realtime_factor_64voice_synth_graph",
                "value": round(rtf, 1),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 12.37, 2),
                "detail": {
                    "wall_s": round(wall, 4),
                    "msamples_per_s": round(msps, 1),
                    "backend": jax.default_backend(),
                    "workload": "64 sine voices -> swept biquad -> tanh, 10 s @ 44.1 kHz",
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
