"""Fused filter+gain+mix Pallas kernel vs the XLA reference pipeline."""

import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.ops.linrec import affine_scan_2
from pygmu2_tpu.soundfont.filter_pallas import filter_gain_mix_pallas
from pygmu2_tpu.soundfont.params import NON_AUDIBLE


def _xla_reference(xt, rows, N):
    """The exact XLA pipeline from offline._audio_pass (post-oscillator)."""
    T, P = xt.shape
    B = T // N
    fresh = rows["freshf"] > 0.5
    boundary = (
        jnp.zeros((B, N, P), bool).at[:, 0, :].set(fresh).reshape(T, P)
    )

    def per_sample(c):
        return jnp.broadcast_to(c[:, None, :], (B, N, P)).reshape(T, P)

    b0 = per_sample(rows["b0"])
    b1 = per_sample(rows["b1"])
    b2 = per_sample(rows["b2"])
    a1 = per_sample(rows["a1"])
    a2 = per_sample(rows["a2"])
    x1 = jnp.concatenate([jnp.zeros((1, P), xt.dtype), xt[:-1]], axis=0)
    x2 = jnp.concatenate([jnp.zeros((2, P), xt.dtype), xt[:-2]], axis=0)
    b1_ok = ~boundary
    b2_ok = b1_ok & jnp.concatenate(
        [jnp.ones((1, P), bool), b1_ok[:-1]], axis=0
    )
    fir = b0 * xt + b1 * jnp.where(b1_ok, x1, 0.0) + b2 * jnp.where(b2_ok, x2, 0.0)
    keep = (~boundary).astype(jnp.float32)
    y, _ = affine_scan_2(
        -a1 * keep, -a2 * keep, keep,
        jnp.zeros((T, P), jnp.float32), fir, jnp.zeros((T, P), jnp.float32),
    )
    ramp = jnp.arange(N, dtype=jnp.float32)[None, :, None] / N

    def gain_grid(prev, cur):
        audible = jnp.maximum(prev, cur) >= NON_AUDIBLE
        const = jnp.abs(cur - prev) < 1.0e-3
        g = jnp.where(
            const[:, None, :], cur[:, None, :],
            prev[:, None, :] + (cur - prev)[:, None, :] * ramp,
        )
        return jnp.where(audible[:, None, :], g, 0.0).reshape(T, P)

    gl = gain_grid(rows["pgl"], rows["gl"])
    gr = gain_grid(rows["pgr"], rows["gr"])
    return jnp.stack(
        [jnp.sum(gl * y, axis=1), jnp.sum(gr * y, axis=1)], axis=1
    )


def test_fused_kernel_matches_xla():
    rng = np.random.default_rng(0)
    B, N, P = 3, 256, 128
    T = B * N
    xt = jnp.asarray(rng.standard_normal((T, P)).astype(np.float32))
    # stable poles: a1 = -2 r cos(th), a2 = r^2 with r < 0.95
    r = rng.uniform(0.1, 0.95, (B, P))
    th = rng.uniform(0, np.pi, (B, P))
    rows = {
        "b0": rng.uniform(0.0, 0.3, (B, P)),
        "b1": rng.uniform(0.0, 0.5, (B, P)),
        "b2": rng.uniform(0.0, 0.3, (B, P)),
        "a1": -2.0 * r * np.cos(th),
        "a2": r**2,
        "freshf": (rng.uniform(0, 1, (B, P)) > 0.6).astype(np.float32),
        "pgl": rng.uniform(0, 0.5, (B, P)),
        "gl": rng.uniform(0, 0.5, (B, P)),
        "pgr": rng.uniform(0, 0.5, (B, P)),
        "gr": rng.uniform(0, 0.5, (B, P)),
    }
    rows["freshf"] = rows["freshf"].copy()
    rows["freshf"][0] = 1.0  # first block is always fresh
    rows = {k: jnp.asarray(v.astype(np.float32)) for k, v in rows.items()}

    ref = _xla_reference(xt, rows, N)
    got = filter_gain_mix_pallas(xt, rows, N, chunk=128, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * max(scale, 1.0)
    )
