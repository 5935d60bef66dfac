"""Property tests over randomly composed graphs.

For any graph the framework guarantees (SURVEY §1 contracts):
  1. render(start, d) returns exactly d samples;
  2. chunked rendering equals one-shot rendering (the engine carries
     or resets state as needed);
  3. samples outside a finite extent are zero;
  4. pure graphs answer windows in any order with identical results.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg

pytestmark = pytest.mark.slow  # minutes of randomized graph compiles

SR = 44100


def _subgraph_pure(pe):
    return pe.is_pure() and all(_subgraph_pure(i) for i in pe.inputs())


def _random_graph(rng):
    """Compose a random graph, 2-4 levels deep."""
    def leaf():
        k = rng.integers(0, 5)
        if k == 0:
            return pg.SinePE(frequency=float(rng.uniform(50, 2000)),
                             amplitude=float(rng.uniform(0.1, 1.0)))
        if k == 1:
            data = rng.standard_normal((int(rng.integers(500, 3000)), 1)).astype(np.float32)
            return pg.ArrayPE(data)
        if k == 2:
            return pg.NoisePE(seed=int(rng.integers(0, 100)))
        if k == 3:
            return pg.ConstantPE(float(rng.uniform(-1, 1)))
        return pg.FunctionGenPE(frequency=float(rng.uniform(50, 500)))

    def wrap(x):
        k = rng.integers(0, 17)
        if k == 0:
            return pg.GainPE(x, float(rng.uniform(0.1, 2.0)))
        if k == 1:
            return pg.DelayPE(x, int(rng.integers(0, 500)))
        if k == 2:
            return pg.CropPE(x, int(rng.integers(0, 100)), int(rng.integers(500, 4000)))
        if k == 3:
            return pg.MixPE(x, leaf())
        if k == 4:
            return pg.BiquadPE(x, float(rng.uniform(200, 8000)), 1.0)
        if k == 5:
            return pg.TransformPE(x, lambda a: np.tanh(a) if isinstance(a, np.ndarray) else a)
        if k == 6:
            return pg.EnvelopePE(x, attack=0.01, release=0.05)
        if k == 7:
            return pg.SVFilterPE(x, float(rng.uniform(200, 8000)), 1.0)
        if k == 8:
            return pg.LadderPE(x, float(rng.uniform(500, 5000)), resonance=0.3)
        if k == 9:
            return pg.CombPE(x, float(rng.uniform(100, 400)), feedback=0.5)
        if k == 10:
            return pg.SlewLimiterPE(x, rise_rate=float(rng.uniform(5, 50)))
        if k == 11:
            gate = pg.PeriodicGate(frequency=float(rng.uniform(0.5, 4.0)))
            return pg.GainPE(x, pg.AdsrGatedPE(gate, 0.01, 0.05, 0.6, 0.1))
        if k == 12:
            return pg.SampleHoldPE(x, pg.PeriodicTrigger(hz=float(rng.uniform(20, 200))))
        if k == 13:
            return pg.TrackHoldPE(x, pg.PeriodicGate(frequency=float(rng.uniform(20, 100))))
        if k == 14:
            # TimeWarp reads its source at random-access windows; over a
            # STATEFUL source the window pulls are non-contiguous, so
            # chunked != one-shot by design (the reference behaves the
            # same: impure PEs reset on non-contiguous requests). Only
            # warp pure subgraphs in the invariance fuzz.
            if _subgraph_pure(x):
                return pg.TimeWarpPE(x, rate=float(rng.uniform(0.5, 2.0)))
            return pg.GainPE(x, 0.8)
        if k == 15:
            return pg.ReversePitchEchoPE(
                x, block_seconds=0.01, feedback=0.4, max_delay_seconds=0.03
            )
        return pg.SetExtentPE(x, 0, int(rng.integers(1000, 4000)))

    g = leaf()
    for _ in range(int(rng.integers(1, 4))):
        g = wrap(g)
    return g


@pytest.mark.parametrize("seed", range(12))
def test_contracts_hold(seed):
    rng = np.random.default_rng(seed)
    g = _random_graph(rng)

    # 1. exact duration
    d = int(rng.integers(100, 2000))
    start = int(rng.integers(-200, 500))
    snip = g.render(start, d)
    assert snip.data.shape[0] == d
    assert snip.data.dtype == np.float32 or snip.data.dtype == np.dtype("float32")
    assert np.isfinite(snip.data).all()

    # 2. chunked == one-shot (fresh equivalent graph per pass)
    rng2 = np.random.default_rng(seed)
    g1 = _random_graph(rng2)
    total = 4096
    full = g1.render(0, total).data

    rng3 = np.random.default_rng(seed)
    g2 = _random_graph(rng3)
    parts = []
    pos = 0
    while pos < total:
        n = min(int(rng.integers(256, 1024)), total - pos)
        parts.append(g2.render(pos, n).data)
        pos += n
    np.testing.assert_allclose(np.concatenate(parts), full, atol=1e-4)

    # 3. zero outside finite extent
    ext = g.extent()
    if ext.end is not None:
        after = g.render(int(ext.end) + 10, 64).data
        assert np.abs(after).max() == 0.0

    # 4. pure graphs: window order doesn't matter
    if g.is_pure():
        a1 = g.render(1000, 256).data
        _ = g.render(5000, 256)
        _ = g.render(0, 128)
        a2 = g.render(1000, 256).data
        np.testing.assert_array_equal(a1, a2)
