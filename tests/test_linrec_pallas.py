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
