"""Pallas blocked affine scan vs the associative-scan reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from pygmu2_tpu.ops.linrec import affine_scan_2
from pygmu2_tpu.ops.linrec_pallas import affine_scan_2_pallas


def _random_case(T, P, seed=0):
    rng = np.random.default_rng(seed)
    mats = [
        jnp.asarray(rng.uniform(-0.9, 0.9, (T, P)).astype(np.float32))
        for _ in range(4)
    ]
    us = [
        jnp.asarray(rng.standard_normal((T, P)).astype(np.float32))
        for _ in range(2)
    ]
    return mats, us


@pytest.mark.parametrize("T,chunk", [(512, 256), (700, 256), (256, 128)])
def test_matches_associative_scan(T, chunk):
    mats, us = _random_case(T, 128, seed=T)
    ref = affine_scan_2(*mats, *us)
    got = affine_scan_2_pallas(*mats, *us, chunk=chunk, interpret=True)
    for r, g in zip(ref, got):
        scale = float(jnp.max(jnp.abs(r)))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5 * max(scale, 1.0)
        )


def test_initial_state():
    mats, us = _random_case(300, 128, seed=7)
    rng = np.random.default_rng(8)
    s0 = (
        jnp.asarray(rng.standard_normal(128).astype(np.float32)),
        jnp.asarray(rng.standard_normal(128).astype(np.float32)),
    )
    ref = affine_scan_2(*mats, *us, s0=s0)
    got = affine_scan_2_pallas(*mats, *us, s0=s0, chunk=256, interpret=True)
    for r, g in zip(ref, got):
        scale = float(jnp.max(jnp.abs(r)))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5 * max(scale, 1.0)
        )


def test_gated_biquad_structure():
    """The exact structure the SoundFont filter uses (a22 = u2 = 0)."""
    T, P = 640, 128
    rng = np.random.default_rng(3)
    a1 = jnp.asarray(rng.uniform(-1.8, 1.8, (T, P)).astype(np.float32))
    a2 = jnp.asarray(rng.uniform(-0.9, 0.9, (T, P)).astype(np.float32))
    keep = jnp.asarray(
        (rng.uniform(0, 1, (T, P)) > 0.05).astype(np.float32)
    )
    fir = jnp.asarray(rng.standard_normal((T, P)).astype(np.float32))
    z = jnp.zeros((T, P), jnp.float32)
    ref = affine_scan_2(-a1 * keep, -a2 * keep, keep, z, fir, z)
    got = affine_scan_2_pallas(
        -a1 * keep, -a2 * keep, keep, z, fir, z, chunk=128, interpret=True
    )
    for r, g in zip(ref, got):
        scale = float(jnp.max(jnp.abs(r)))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-5 * max(scale, 1.0)
        )


def _render(graph_fn, force_kernel):
    import pygmu2_tpu as pg
    from pygmu2_tpu.core import engine
    from pygmu2_tpu.ops import diffable

    pg.set_sample_rate(44100)
    diffable.FORCE_KERNEL_INTERPRET = force_kernel
    try:
        return np.asarray(engine.render_scan(graph_fn(), 0, 8192, 8192))
    finally:
        diffable.FORCE_KERNEL_INTERPRET = False


def test_auto_routed_biquad_matches_sequential_oracle():
    """affine_scan_2_auto routes long-window BiquadPE renders through the
    Mosaic kernel. Against an exact sequential float64 oracle the kernel
    path is ACCURATE at a startup transient that defeats the associative
    scan: a sweep dwelling near 200 Hz at Q=2 puts the poles at radius
    ~0.9965, and the associative scan's long-range map compositions
    amplify f32 rounding to ~0.6 absolute error there (observed round-5)
    while the chunked Kogge-Stone kernel stays <=1e-4. This pins the
    kernel path's accuracy so a regression to the old behavior fails."""
    import pygmu2_tpu as pg
    from pygmu2_tpu.core import engine

    def graph():
        sweep = pg.PiecewisePE([(0, 200.0), (44100, 8000.0)])
        return pg.CropPE(pg.BiquadPE(pg.NoisePE(seed=7), sweep, 2.0), 0, 8192)

    got = _render(graph, force_kernel=True)[:, 0]

    # Sequential float64 oracle from the same rendered inputs, mirroring
    # BiquadPE._coefficients (RBJ lowpass) in f64.
    pg.set_sample_rate(44100)
    x = np.asarray(
        engine.render_scan(pg.CropPE(pg.NoisePE(seed=7), 0, 8192), 0, 8192, 8192)
    )[:, 0].astype(np.float64)
    sw = np.asarray(
        engine.render_scan(
            pg.CropPE(pg.PiecewisePE([(0, 200.0), (44100, 8000.0)]), 0, 8192),
            0, 8192, 8192,
        )
    )[:, 0].astype(np.float64)
    f = np.clip(sw, 1.0, 44100 / 2 * 0.99)
    w = 2 * np.pi * f / 44100
    alpha = np.sin(w) / (2 * 2.0)
    a0 = 1 + alpha
    b0 = (1 - np.cos(w)) / 2 / a0
    b1 = (1 - np.cos(w)) / a0
    b2 = b0
    a1 = -2 * np.cos(w) / a0
    a2 = (1 - alpha) / a0
    y64 = np.zeros(8192)
    x1 = x2 = y1 = y2 = 0.0
    for t in range(8192):
        y = b0[t] * x[t] + b1[t] * x1 + b2[t] * x2 - a1[t] * y1 - a2[t] * y2
        y64[t] = y
        x2, x1 = x1, x[t]
        y2, y1 = y1, y
    np.testing.assert_allclose(got, y64, atol=2e-4)


def test_auto_routed_svf_matches_scan_path():
    """SVFilterPE through the auto-routed kernel vs the associative scan
    on a gentle sweep (both well-conditioned there)."""
    import pygmu2_tpu as pg

    def graph():
        sweep = pg.PiecewisePE([(0, 800.0), (44100, 8000.0)])
        return pg.CropPE(pg.SVFilterPE(pg.NoisePE(seed=7), sweep, 1.0), 0, 8192)

    base = _render(graph, force_kernel=False)
    got = _render(graph, force_kernel=True)
    scale = max(float(np.abs(base).max()), 1.0)
    np.testing.assert_allclose(got, base, atol=2e-4 * scale)
