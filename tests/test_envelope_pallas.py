"""Asymmetric envelope-follower Mosaic kernel vs the lax.scan body."""

import numpy as np

import jax.numpy as jnp

from pygmu2_tpu.ops.envelope_pallas import envelope_ar_pallas


def _scan_oracle(x, env0, atk, rel):
    env = env0.copy().astype(np.float64)
    out = np.zeros_like(x, dtype=np.float64)
    for i in range(len(x)):
        coeff = np.where(x[i] > env, atk, rel)
        env = env + coeff * (x[i] - env)
        out[i] = env
    return out


def test_kernel_matches_scan():
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((3000, 2)).astype(np.float32)) * 0.5
    atk, rel = 0.02, 0.001
    ref = _scan_oracle(x, np.zeros(2, np.float32), atk, rel)
    y, ef = envelope_ar_pallas(
        jnp.asarray(x), jnp.zeros((2,), jnp.float32),
        atk=atk, rel=rel, chunk=512, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ef), ref[-1], atol=1e-5)


def test_kernel_state_carry_across_calls():
    rng = np.random.default_rng(1)
    x = np.abs(rng.standard_normal((2000, 1)).astype(np.float32))
    atk, rel = 0.05, 0.002
    one, _ = envelope_ar_pallas(
        jnp.asarray(x), jnp.zeros((1,), jnp.float32),
        atk=atk, rel=rel, chunk=512, interpret=True,
    )
    y1, e1 = envelope_ar_pallas(
        jnp.asarray(x[:900]), jnp.zeros((1,), jnp.float32),
        atk=atk, rel=rel, chunk=512, interpret=True,
    )
    y2, _ = envelope_ar_pallas(
        jnp.asarray(x[900:]), e1, atk=atk, rel=rel, chunk=512,
        interpret=True,
    )
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_allclose(got, np.asarray(one), atol=1e-6)
