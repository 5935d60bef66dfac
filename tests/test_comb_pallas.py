"""Pallas comb kernel vs the lax.scan path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.ops.comb_pallas import comb_scan_pallas


def _scan_ref(x, freq, fb, buf, pos, sf, L, sr, alpha):
    C = x.shape[1]

    def step(carry, inp):
        buf, pos, sf = carry
        xi, fi, fbi = inp
        sf = jnp.where(sf < 0.0, fi, sf + (fi - sf) * alpha)
        delay = jnp.clip(
            jnp.round(sr / jnp.maximum(sf, 1.0)).astype(jnp.int32), 1, L - 1
        )
        read = jnp.mod(pos - delay, L).astype(jnp.int32)
        delayed = jax.lax.dynamic_slice(buf, (read, jnp.int32(0)), (1, C))[0]
        out = xi + fbi * delayed
        buf = jax.lax.dynamic_update_slice(buf, out[None], (pos, jnp.int32(0)))
        pos = jnp.mod(pos + 1, L)
        return (buf, pos, sf), out

    (buf, pos, sf), y = jax.lax.scan(
        step, (buf, jnp.int32(pos), jnp.float32(sf)), (x, freq, fb)
    )
    return y, buf, pos, sf


def test_matches_scan_with_wraps_and_padding():
    rng = np.random.default_rng(1)
    T, C, L, sr = 700, 2, 201, 44100.0
    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32) * 0.3)
    freq = jnp.asarray(rng.uniform(220, 880, T).astype(np.float32))
    fb = jnp.asarray(rng.uniform(-0.9, 0.9, T).astype(np.float32))
    buf = jnp.asarray(rng.standard_normal((L, C)).astype(np.float32) * 0.1)
    y1, b1, p1, s1 = _scan_ref(x, freq, fb, buf, 5, -1.0, L, sr, 1 / 2400)
    y2, b2, p2, s2 = comb_scan_pallas(
        x, freq, fb, buf, jnp.int32(5), jnp.float32(-1.0),
        L=L, sr=sr, smooth_alpha=1 / 2400, chunk=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-5)
    assert int(p2) == int(p1)
    np.testing.assert_allclose(float(s2), float(s1), atol=1e-4)
