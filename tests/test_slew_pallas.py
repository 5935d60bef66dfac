"""Slew-limiter Mosaic kernel: interpret-mode parity vs the scan
reference, PE-level routing, chunked state carry, and gradients
(repo convention: every Pallas kernel ships a scan fallback and an
interpret=True parity test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygmu2_tpu as pg
from pygmu2_tpu.models.modes import SlewMode
from pygmu2_tpu.ops import diffable
from pygmu2_tpu.ops.slew_pallas import slew_scan_pallas, slew_scan_ref


def _seq_oracle(x, cur, linear, pr, pf):
    out = []
    cur = np.float32(cur)
    for xi in np.asarray(x, np.float32):
        if linear:
            cur = np.float32(cur + np.clip(np.float32(xi - cur), -pf, pr))
        else:
            err = np.float32(xi - cur)
            k = pr if err > 0 else pf
            cur = np.float32(cur + np.float32(k) * err)
        out.append(cur)
    return np.asarray(out, np.float32), cur


@pytest.mark.parametrize("linear", [True, False])
@pytest.mark.parametrize("T", [1024, 1500])  # aligned + guard tail
def test_kernel_interpret_matches_scan(linear, T):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
    pr, pf = 0.01, 0.004
    y_k, f_k = slew_scan_pallas(
        x, jnp.float32(0.3), linear=linear, p_rise=pr, p_fall=pf,
        chunk=512, interpret=True,
    )
    y_s, f_s = slew_scan_ref(
        x, jnp.float32(0.3), linear=linear, p_rise=pr, p_fall=pf
    )
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_s), atol=1e-6)
    np.testing.assert_allclose(float(f_k), float(f_s), atol=1e-6)
    ref, f_ref = _seq_oracle(x, 0.3, linear, pr, pf)
    np.testing.assert_allclose(np.asarray(y_k), ref, atol=2e-6)


@pytest.mark.parametrize("mode", [SlewMode.LINEAR, SlewMode.EXPONENTIAL])
def test_pe_kernel_route_matches_scan_route(mode):
    def make():
        return pg.SlewLimiterPE(
            pg.NoisePE(seed=5), rise_rate=30.0, fall_rate=12.0, mode=mode
        )

    a = np.asarray(make().render(0, 3000).data)
    diffable.FORCE_KERNEL_INTERPRET = True
    try:
        b = np.asarray(make().render(0, 3000).data)
    finally:
        diffable.FORCE_KERNEL_INTERPRET = False
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_pe_chunked_matches_oneshot():
    one = np.asarray(
        pg.SlewLimiterPE(pg.NoisePE(seed=2), 25.0, 10.0).render(0, 4000).data
    )
    pe = pg.SlewLimiterPE(pg.NoisePE(seed=2), 25.0, 10.0)
    parts = [
        np.asarray(pe.render(s, min(613, 4000 - s)).data)
        for s in range(0, 4000, 613)
    ]
    np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-6)


def test_gradient_through_kernel_path():
    diffable.FORCE_KERNEL_INTERPRET = True
    try:
        x = jnp.asarray(
            np.random.default_rng(1).normal(0, 1, 600).astype(np.float32)
        )

        def loss(c0):
            y, _ = slew_scan_pallas(
                x, c0, linear=True, p_rise=0.01, p_fall=0.01,
                chunk=256, interpret=True,
            )
            return jnp.mean(y**2)

        g = jax.grad(loss)(jnp.float32(0.5))
        assert np.isfinite(float(g))
        eps = 1e-3
        fd = (float(loss(jnp.float32(0.5 + eps)))
              - float(loss(jnp.float32(0.5 - eps)))) / (2 * eps)
        assert abs(float(g) - fd) < 0.05 * max(abs(fd), 1e-3)
    finally:
        diffable.FORCE_KERNEL_INTERPRET = False
