"""Pallas Karplus-Strong kernel vs the lax.scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.ops.ks_pallas import ks_scan_pallas


def _scan_ref(rho_t, active, buf, r, ap_in, ap_out, L, c):
    def step(carry, inp):
        rho_eff, act = inp
        buf, rr = carry[0], carry[1]
        r_next = jnp.mod(rr + 1, L)
        out_val = rho_eff * (buf[rr] + buf[r_next]) * 0.5
        new_ap = c * out_val + carry[2] - c * carry[3]
        new = (buf.at[rr].set(new_ap), r_next, out_val, new_ap)
        carry = jax.tree_util.tree_map(
            lambda n, o: jnp.where(act, n, o), new, carry
        )
        return carry, jnp.where(act, new_ap, 0.0)

    fin, y = jax.lax.scan(
        step,
        (buf, jnp.int32(r), jnp.float32(ap_in), jnp.float32(ap_out)),
        (rho_t, active),
    )
    return y, fin


def test_matches_scan_with_inactive_prefix_and_padding():
    rng = np.random.default_rng(5)
    T, L, c = 700, 171, 0.35
    rho = jnp.asarray(rng.uniform(0.95, 0.999, T).astype(np.float32))
    act = jnp.asarray(np.arange(T) >= 37)  # string starts mid-buffer
    buf = jnp.asarray(rng.standard_normal(L).astype(np.float32))
    y1, f1 = _scan_ref(rho, act, buf, 3, 0.1, -0.2, L, c)
    y2, b2, r2, ai2, ao2 = ks_scan_pallas(
        rho, act, buf, jnp.int32(3), jnp.float32(0.1), jnp.float32(-0.2),
        L=L, allpass_c=c, chunk=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(f1[0]), atol=1e-5)
    assert int(r2) == int(f1[1])
