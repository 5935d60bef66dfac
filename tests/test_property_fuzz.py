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

SR = 44100


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
        k = rng.integers(0, 7)
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
        return pg.EnvelopePE(x, attack=0.01, release=0.05)

    g = leaf()
    for _ in range(int(rng.integers(1, 4))):
        g = wrap(g)
    return g


@pytest.mark.parametrize("seed", range(8))
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
    np.testing.assert_allclose(np.concatenate(parts), full, atol=2e-5)

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
