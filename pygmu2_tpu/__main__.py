"""CLI entry: quick environment/bench check.

Usage: python -m pygmu2_tpu [seconds]
Renders the hello-sine graph and reports the realtime factor.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    import jax
    import numpy as np

    import pygmu2_tpu as pg
    from pygmu2_tpu.core import engine

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    pg.set_sample_rate(44100)
    total = int(seconds * 44100)
    graph = pg.CropPE(pg.GainPE(pg.SinePE(frequency=440.0), 0.5), 0, total)

    out = engine.render_scan(graph, 0, total, 16384)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = engine.render_scan(graph, 0, total, 16384)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    peak = float(np.abs(np.asarray(out)).max())
    print(
        f"pygmu2_tpu {pg.__version__} | backend={jax.default_backend()} | "
        f"{seconds:.1f}s rendered in {wall * 1e3:.2f} ms "
        f"({seconds / wall:.0f}x realtime) | peak={peak:.3f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
