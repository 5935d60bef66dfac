"""Pallas ladder kernel vs the lax.scan path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.ops.ladder_pallas import ladder_scan_pallas


def _scan_ref(x, al, qa, ki, dsc, state, os_n, pbg, mode_index, thr, dec):
    os_recip = 1.0 / os_n

    def mode_mix(u, s1, s2, s3, s4):
        if mode_index == 0:
            return s4
        if mode_index == 2:
            return (s2 + s4) * 4.0 - s3 * 8.0
        return s2

    def step(carry, inp):
        z0, z1, old = list(carry[0]), list(carry[1]), carry[2]
        xi, a, q, k, d = inp
        inp_s = xi * d
        quiet = jnp.abs(inp_s) < thr
        decay = jnp.where(quiet, dec, 1.0)
        z0 = [z * decay for z in z0]
        z1 = [z * decay for z in z1]
        old = old * decay
        total = jnp.zeros_like(inp_s)
        for s_idx in range(os_n):
            interp = s_idx * os_recip
            in_i = interp * old + (1.0 - interp) * inp_s
            u = jnp.tanh(in_i - (z1[3] - pbg * in_i) * k * q)
            stages = []
            prev = u
            for st_i in range(4):
                ft = prev * 0.76923077 + 0.23076923 * z0[st_i] - z1[st_i]
                ft = ft * a + z1[st_i]
                z1[st_i] = ft
                z0[st_i] = prev
                stages.append(ft)
                prev = ft
            total = total + mode_mix(u, *stages) * os_recip
        return (tuple(z0), tuple(z1), inp_s), total

    init = (
        tuple(state[i] for i in range(4)),
        tuple(state[4 + i] for i in range(4)),
        state[8],
    )
    fin, y = jax.lax.scan(
        step, init, (x, al[:, None], qa[:, None], ki[:, None], dsc[:, None])
    )
    return y, jnp.stack(list(fin[0]) + list(fin[1]) + [fin[2]])


def test_matches_scan_including_state_and_padding():
    rng = np.random.default_rng(3)
    T, C = 700, 2  # 700 % 256 != 0 -> exercises the padded-tail guard
    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32) * 0.5)
    al = jnp.asarray(rng.uniform(0.1, 0.6, T).astype(np.float32))
    qa = jnp.asarray(rng.uniform(0.9, 1.1, T).astype(np.float32))
    ki = jnp.asarray(rng.uniform(0.0, 3.0, T).astype(np.float32))
    dsc = jnp.asarray(rng.uniform(0.5, 1.5, T).astype(np.float32))
    st = jnp.asarray(rng.standard_normal((9, C)).astype(np.float32) * 0.1)
    for mode_index in (0, 2):
        y1, s1 = _scan_ref(x, al, qa, ki, dsc, st, 2, 0.5, mode_index, 1e-6, 0.999)
        y2, s2 = ladder_scan_pallas(
            x, al, qa, ki, dsc, st, os_n=2, pbg=0.5, mode_index=mode_index,
            input_threshold=1e-6, state_decay=0.999, chunk=256, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)
