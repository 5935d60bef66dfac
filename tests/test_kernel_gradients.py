"""Gradients through the sequential Mosaic kernels (VERDICT r3 item 6).

Every Pallas kernel entry point carries a custom_vjp whose backward
replays the module's pure-jax ``lax.scan`` reference
(ops/diffable.kernel_with_scan_vjp), so ``jax.grad`` works on the TPU
kernel paths — not just the CPU fallbacks. Each case here, in interpret
mode on CPU:

1. pins forward parity kernel == scan reference (the reference IS the
   backward body, so this bounds cotangent fidelity), and
2. checks the AD gradient against central finite differences.

The reference has no gradient story at all (Numba kernels); this is the
TPU build's self-set differentiable-synthesis bar
(core/engine.py render_functional).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygmu2_tpu.ops import diffable


def _fd_check(loss, x, idxs, atol=2e-2, rtol=8e-2, eps=1e-3):
    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    for idx in idxs:
        xp = x.at[idx].add(eps)
        xm = x.at[idx].add(-eps)
        fd = (loss(xp) - loss(xm)) / (2 * eps)
        np.testing.assert_allclose(
            float(g[idx]), float(fd), atol=atol, rtol=rtol,
            err_msg=f"AD vs finite difference at {idx}",
        )


# ---- ladder ---------------------------------------------------------------


def _ladder_args(T=300, C=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32)) * 0.3
    al = jnp.asarray(rng.uniform(0.1, 0.6, T).astype(np.float32))
    qa = jnp.full((T,), 2.0, jnp.float32)
    ki = jnp.full((T,), 0.5, jnp.float32)
    dsc = jnp.full((T,), 0.8, jnp.float32)
    st = jnp.zeros((9, C), jnp.float32)
    kw = dict(os_n=2, pbg=0.3, mode_index=0, input_threshold=1e-5,
              state_decay=0.999)
    return (x, al, qa, ki, dsc, st), kw


def test_ladder_grad_matches_fd():
    from pygmu2_tpu.ops.ladder_pallas import ladder_scan_pallas, ladder_scan_ref

    (x, al, qa, ki, dsc, st), kw = _ladder_args()
    y1, s1 = ladder_scan_pallas(
        x, al, qa, ki, dsc, st, chunk=128, interpret=True, **kw
    )
    y2, s2 = ladder_scan_ref(x, al, qa, ki, dsc, st, **kw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)

    def loss(x):
        y, _ = ladder_scan_pallas(
            x, al, qa, ki, dsc, st, chunk=128, interpret=True, **kw
        )
        return jnp.sum(y ** 2)

    _fd_check(loss, x, [(5, 0), (100, 1), (250, 0)])

    # coefficient gradients too (the differentiable-synthesis use case)
    def loss_al(al):
        y, _ = ladder_scan_pallas(
            x, al, qa, ki, dsc, st, chunk=128, interpret=True, **kw
        )
        return jnp.sum(y ** 2)

    _fd_check(loss_al, al, [(50,), (200,)])


# ---- comb -----------------------------------------------------------------


def test_comb_grad_matches_fd():
    from pygmu2_tpu.ops.comb_pallas import comb_scan_pallas, comb_scan_ref

    rng = np.random.default_rng(1)
    T, C, L, sr = 400, 2, 97, 8000.0
    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32)) * 0.5
    freq = jnp.full((T,), 220.0, jnp.float32)
    fb = jnp.full((T,), 0.7, jnp.float32)
    buf = jnp.zeros((L, C), jnp.float32)
    kw = dict(L=L, sr=sr, smooth_alpha=1.0 / 240)
    args = (x, freq, fb, buf, jnp.int32(0), jnp.float32(-1.0))

    y1 = comb_scan_pallas(*args, chunk=128, interpret=True, **kw)
    y2 = comb_scan_ref(*args, **kw)
    for a, b in zip(y1, y2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss(x):
        y, *_ = comb_scan_pallas(
            x, freq, fb, buf, jnp.int32(0), jnp.float32(-1.0),
            chunk=128, interpret=True, **kw
        )
        return jnp.sum(y ** 2)

    _fd_check(loss, x, [(3, 0), (200, 1)])

    def loss_fb(fb):
        y, *_ = comb_scan_pallas(
            x, freq, fb, buf, jnp.int32(0), jnp.float32(-1.0),
            chunk=128, interpret=True, **kw
        )
        return jnp.sum(y ** 2)

    _fd_check(loss_fb, fb, [(150,)])


# ---- Karplus-Strong -------------------------------------------------------


def test_ks_grad_matches_fd():
    from pygmu2_tpu.ops.ks_pallas import ks_scan_pallas, ks_scan_ref

    rng = np.random.default_rng(2)
    T, L, c = 500, 83, 0.35
    rho = jnp.asarray(rng.uniform(0.95, 0.999, T).astype(np.float32))
    act = jnp.asarray(np.arange(T) >= 10)
    buf = jnp.asarray(rng.standard_normal(L).astype(np.float32))
    args = (rho, act, buf, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0))
    kw = dict(L=L, allpass_c=c)

    y1 = ks_scan_pallas(*args, chunk=128, interpret=True, **kw)
    y2 = ks_scan_ref(*args, **kw)
    for a, b in zip(y1, y2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss(buf):
        y, *_ = ks_scan_pallas(
            rho, act, buf, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
            chunk=128, interpret=True, **kw
        )
        return jnp.sum(y ** 2)

    _fd_check(loss, buf, [(7,), (40,)])


# ---- ADSR -----------------------------------------------------------------


def test_adsr_grad_defined_and_state_parity():
    from pygmu2_tpu.ops.adsr_pallas import adsr_scan_pallas, adsr_scan_ref

    T = 2000
    gate = np.zeros(T, np.float32)
    gate[100:1200] = 1.0
    gate = jnp.asarray(gate)
    kw = dict(dA=1.0 / 80, dD=-0.4 / 200, dR=-0.6 / 300, sus=0.6)
    st = jnp.zeros((4,), jnp.float32)

    y1, s1 = adsr_scan_pallas(gate, st, chunk=256, interpret=True, **kw)
    y2, s2 = adsr_scan_ref(gate, st, **kw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)

    # the envelope is a state machine over gate EDGES: gradients must be
    # DEFINED (finite) on the kernel path; the e0 carry is the
    # continuously-differentiable channel
    def loss_state(st):
        y, _ = adsr_scan_pallas(gate, st, chunk=256, interpret=True, **kw)
        return jnp.sum(y)

    g = jax.grad(loss_state)(jnp.asarray([4.0, 0.5, 3.0, 1.0], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


# ---- envelope follower ----------------------------------------------------


def test_envelope_ar_grad_matches_fd():
    from pygmu2_tpu.ops.envelope_pallas import (
        envelope_ar_pallas,
        envelope_ar_scan_ref,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(
        np.abs(rng.standard_normal((600, 2)).astype(np.float32)) * 0.5
    )
    e0 = jnp.zeros((2,), jnp.float32)
    kw = dict(atk=0.05, rel=0.002)

    y1, f1 = envelope_ar_pallas(x, e0, chunk=256, interpret=True, **kw)
    y2, f2 = envelope_ar_scan_ref(x, e0, **kw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)

    def loss(x):
        y, _ = envelope_ar_pallas(x, e0, chunk=256, interpret=True, **kw)
        return jnp.sum(y ** 2)

    _fd_check(loss, x, [(10, 0), (400, 1)])


# ---- affine linrec --------------------------------------------------------


def test_linrec_pallas_grad_matches_associative_scan():
    from pygmu2_tpu.ops.linrec import affine_scan_2
    from pygmu2_tpu.ops.linrec_pallas import affine_scan_2_pallas

    rng = np.random.default_rng(4)
    T, P = 300, 128
    mk = lambda lo, hi: jnp.asarray(
        rng.uniform(lo, hi, (T, P)).astype(np.float32)
    )
    a11, a12 = mk(0.8, 0.99), mk(-0.1, 0.1)
    a21, a22 = mk(-0.1, 0.1), mk(0.8, 0.99)
    u1, u2 = mk(-1, 1), mk(-1, 1)

    def loss_k(u1):
        s1, s2 = affine_scan_2_pallas(
            a11, a12, a21, a22, u1, u2, chunk=128, interpret=True
        )
        return jnp.sum(s1 ** 2) + jnp.sum(s2 ** 2)

    def loss_s(u1):
        s1, s2 = affine_scan_2(a11, a12, a21, a22, u1, u2)
        return jnp.sum(s1 ** 2) + jnp.sum(s2 ** 2)

    gk = jax.grad(loss_k)(u1)
    gs = jax.grad(loss_s)(u1)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gs), atol=1e-3)


# ---- reverse pitch echo ---------------------------------------------------


def test_reverse_echo_grad_matches_fd():
    from pygmu2_tpu.ops.reverse_echo_pallas import (
        MISC_FIELDS,
        reverse_echo_scan_pallas,
        reverse_echo_scan_ref,
    )

    rng = np.random.default_rng(5)
    T, C, cap, plen = 400, 1, 96, 64
    sr = 8000.0
    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32)) * 0.5
    blk = jnp.full((T,), 40.0 / sr, jnp.float32)
    ratio = jnp.full((T,), 1.5, jnp.float32)
    fb = jnp.full((T,), 0.4, jnp.float32)
    alt = jnp.ones((T,), jnp.float32)
    ba = jnp.zeros((cap, C), jnp.float32)
    bb = jnp.zeros((cap, C), jnp.float32)
    pb = jnp.zeros((plen, C), jnp.float32)
    misc = jnp.asarray(
        [1, 0, 0.0, 0, 0, 40.0, 40, 0, 1], jnp.float32
    )
    assert len(misc) == len(MISC_FIELDS)
    kw = dict(sr=sr, plen=plen, cap=cap, min_block=8, max_block=cap - 1,
              smooth_alpha=1.0 / 240)
    args = (x, blk, ratio, fb, alt, ba, bb, pb, misc)

    y1 = reverse_echo_scan_pallas(*args, chunk=128, interpret=True, **kw)
    y2 = reverse_echo_scan_ref(*args, **kw)
    for a, b in zip(y1, y2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )

    def loss(x):
        y, *_ = reverse_echo_scan_pallas(
            x, blk, ratio, fb, alt, ba, bb, pb, misc,
            chunk=128, interpret=True, **kw
        )
        return jnp.sum(y ** 2)

    _fd_check(loss, x, [(5, 0), (150, 0)])


# ---- PE-level: grad through LadderPE's kernel path ------------------------


def test_grad_through_ladder_pe_kernel_path():
    """render_functional's gradient story on the KERNEL path: a ParamPE
    drive gain differentiates through LadderPE with the Mosaic kernel
    (interpret mode standing in for the TPU backend)."""
    import pygmu2_tpu as pg
    from pygmu2_tpu.core.engine import render_functional

    diffable.FORCE_KERNEL_INTERPRET = True
    try:
        src = pg.SinePE(frequency=220.0)
        gain = pg.ParamPE("drive", default=0.5)
        graph = pg.LadderPE(
            pg.GainPE(src, gain), frequency=1200.0, resonance=1.5
        )

        def loss(b):
            out = render_functional(graph, 0, 512, 256, b)
            return jnp.mean(out ** 2)

        g = jax.grad(loss)({"drive": jnp.float32(0.5)})["drive"]
        assert np.isfinite(float(g))
        eps = 1e-3
        fd = (
            loss({"drive": jnp.float32(0.5 + eps)})
            - loss({"drive": jnp.float32(0.5 - eps)})
        ) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=5e-2, atol=1e-3)
    finally:
        diffable.FORCE_KERNEL_INTERPRET = False
