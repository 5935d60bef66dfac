"""Checkpoint/resume surface: carried state snapshots across graph rebuilds."""

import numpy as np

import pygmu2_tpu as pg
from pygmu2_tpu.core import engine


def _graph():
    noise = pg.NoisePE(seed=7, mode=pg.NoiseMode.PINK)
    return pg.BiquadPE(noise, mode=pg.BiquadMode.LOWPASS, frequency=1000.0, q=0.707)


def test_resume_matches_oneshot():
    total, half = 8192, 4096
    full = np.asarray(engine.render_scan(_graph(), 0, total, 1024))

    g1 = _graph()
    first = np.asarray(engine.render_scan(g1, 0, half, 1024))
    snap = engine.checkpoint_state(g1)
    # snapshot is plain numpy (pickle-able)
    assert all(
        isinstance(leaf, np.ndarray) or np.isscalar(leaf)
        for leaf in __import__("jax").tree_util.tree_leaves(snap)
    )

    g2 = _graph()  # a REBUILT graph (fresh objects, same structure)
    engine.restore_state(g2, snap)
    second = np.asarray(engine.render_scan(g2, half, half, 1024))

    np.testing.assert_allclose(
        np.concatenate([first, second]), full, atol=1e-6
    )


def test_restore_rejects_mismatched_graph():
    g1 = _graph()
    engine.render_scan(g1, 0, 1024, 512)
    snap = engine.checkpoint_state(g1)
    other = pg.GainPE(pg.SinePE(frequency=440.0), 0.5)
    import pytest

    with pytest.raises(ValueError):
        engine.restore_state(other, snap)
