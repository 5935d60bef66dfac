"""ADSR Mosaic kernel vs the lax.scan path (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

import pygmu2_tpu as pg
from pygmu2_tpu.models.envelopes import _IDLE, _SUSTAIN
from pygmu2_tpu.ops.adsr_pallas import adsr_scan_pallas, env_of_state

SR = 44100


def _scan_gated(gate, params):
    """Oracle: the envelopes.AdsrGatedPE lax.scan body, f64 carry."""
    dA, dD, dR, sus = params
    stage, env, pg = 0, 0.0, 0.0
    out = np.zeros(len(gate), np.float64)
    for i, g in enumerate(gate):
        out[i] = env
        rising = pg == 0.0 and g == 1.0
        falling = pg == 1.0 and g == 0.0
        if rising:
            stage = 1
        elif falling:
            stage = 4
        if stage == 0:
            env = 0.0
        elif stage == 1:
            env = env + dA
            if env >= 1.0:
                env, stage = 1.0, 2
        elif stage == 2:
            env = env + dD
            if env <= sus:
                env, stage = sus, 3
        elif stage == 3:
            env = sus
        else:
            env = env + dR
            if env <= 0.0:
                env, stage = 0.0, 0
        pg = g
    return out


def _params(A=0.01, D=0.02, S=0.6, R=0.05):
    return (1.0 / (A * SR), (S - 1.0) / (D * SR), -S / (R * SR), S)


def test_gated_kernel_matches_scan_oracle():
    T = 8000
    gate = np.zeros(T, np.float32)
    gate[100:3000] = 1.0
    gate[5000:5050] = 1.0  # retrigger during release
    p = _params()
    ref = _scan_gated(gate, p)
    kst = jnp.zeros((4,), jnp.float32)
    y, ns = adsr_scan_pallas(
        jnp.asarray(gate), kst, dA=p[0], dD=p[1], dR=p[2], sus=p[3],
        chunk=512, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-6)


def test_gated_kernel_chunked_state_roundtrip():
    """Split the render mid-decay; the (stage, e0, n) -> env -> (stage,
    e0=env, n=0) conversion at the block boundary must be transparent."""
    T = 8000
    gate = np.zeros(T, np.float32)
    gate[100:6000] = 1.0
    p = _params()
    ref = _scan_gated(gate, p)
    kw = dict(dA=p[0], dD=p[1], dR=p[2], sus=p[3], chunk=512, interpret=True)
    cut = 700  # mid-attack
    y1, ns = adsr_scan_pallas(jnp.asarray(gate[:cut]), jnp.zeros((4,), jnp.float32), **kw)
    # block-boundary conversion exactly as AdsrGatedPE._trace does it
    env = env_of_state(ns, dA=p[0], dD=p[1], dR=p[2], sus=p[3])
    kst2 = jnp.stack([ns[0], env, jnp.float32(0.0), ns[3]])
    y2, _ = adsr_scan_pallas(jnp.asarray(gate[cut:]), kst2, **kw)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_triggered_kernel_sustain_expiry():
    """Triggered variant: sustain expires after sustain_samples, then
    releases; a retrigger restarts the attack."""
    T = 12000
    trig = np.zeros(T, np.float32)
    trig[50] = 1.0
    trig[9000] = 1.0
    A, D, S_time, S_lvl, R = 0.005, 0.01, 0.05, 0.7, 0.02
    dA = 1.0 / (A * SR)
    dD = (S_lvl - 1.0) / (D * SR)
    dR = -S_lvl / (R * SR)
    S = int(round(S_time * SR))

    # oracle mirrors the AdsrTriggeredPE scan body
    stage, env, ends = 0, 0.0, 0
    ref = np.zeros(T, np.float64)
    for now in range(T):
        ref[now] = env
        if trig[now] > 0:
            stage = 1
        s0 = stage
        if stage == 0:
            env = 0.0
        elif stage == 1:
            env = env + dA
            if env >= 1.0:
                env, stage = 1.0, 2
        elif stage == 2:
            env = env + dD
            if env <= S_lvl:
                env, stage = S_lvl, 3
        elif stage == 3:
            env = S_lvl
        else:
            env = env + dR
            if env <= 0.0:
                env, stage = 0.0, 0
        if s0 == 2 and stage == 3:
            ends = now + S
        if stage == 3 and now >= ends:
            stage = 4

    y, _ = adsr_scan_pallas(
        jnp.asarray(trig), jnp.zeros((4,), jnp.float32),
        dA=dA, dD=dD, dR=dR, sus=S_lvl, sustain_samples=S,
        chunk=512, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-6)


def test_pe_scan_path_unchanged_on_cpu():
    """On the CPU backend the PEs still use the lax.scan path and match
    the oracle (regression guard for the kernel wiring)."""
    pg.set_sample_rate(SR)
    T = 4000
    gate_arr = np.zeros((T, 1), np.float32)
    gate_arr[200:2500] = 1.0
    g = pg.ArrayPE(gate_arr)
    adsr = pg.AdsrGatedPE(g, attack_time=0.01, decay_time=0.02,
                          sustain_level=0.6, release_time=0.05)
    out = pg.render_to_array(pg.CropPE(adsr, 0, T))
    ref = _scan_gated(gate_arr[:, 0], _params())
    np.testing.assert_allclose(np.asarray(out)[:, 0], ref, atol=1e-5)
