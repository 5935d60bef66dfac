"""Block-parallel fast paths vs the sequential scan references.

ops/comb_block.py (constant-delay comb) must be arithmetically
IDENTICAL to the sequential path — same per-sample op order, no
reassociation. ops/ks_block.py (blocked Karplus-Strong) reassociates
only the first-order allpass chain (static triangular matvec), so it
gets a 1e-5 parity budget like the Mosaic kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.ops.comb_block import comb_const_delay
from pygmu2_tpu.ops.comb_pallas import comb_scan_ref
from pygmu2_tpu.ops.ks_block import ks_blocked
from pygmu2_tpu.ops.ks_pallas import ks_scan_ref

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)


# ---- comb ---------------------------------------------------------------


def _comb_ref_const(x, fb, buf, pos, sf, f, L, sr):
    freq = jnp.full((x.shape[0],), jnp.float32(f))
    return comb_scan_ref(
        x, freq, fb, buf, pos, sf, L=L, sr=sr, smooth_alpha=1 / 2400
    )


@pytest.mark.parametrize("T,L,f", [(700, 201, 220.0), (96, 201, 220.0),
                                   (512, 64, 800.0)])
def test_comb_block_matches_scan(T, L, f):
    rng = np.random.default_rng(7)
    sr = 44100.0
    C = 2
    d = int(np.clip(np.round(np.float32(sr) / np.float32(f)), 1, L - 1))
    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32) * 0.3)
    fb = jnp.asarray(rng.uniform(-0.9, 0.9, T).astype(np.float32))
    buf = jnp.asarray(rng.standard_normal((L, C)).astype(np.float32) * 0.1)
    pos = jnp.int32(rng.integers(0, L))
    y1, b1, p1, s1 = _comb_ref_const(
        x, fb, buf, pos, jnp.float32(-1.0), f, L, sr
    )
    y2, b2, p2 = comb_const_delay(x, fb, buf, pos, d=d, L=L)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-6)
    assert int(p2) == int(p1)
    assert float(s1) == np.float32(f)  # smoother is a bitwise fixed point


def test_comb_block_state_continuation():
    """Two chained fast renders == one long sequential render."""
    rng = np.random.default_rng(3)
    sr, L, f, C = 44100.0, 150, 441.0, 1
    d = int(np.round(np.float32(sr) / np.float32(f)))  # 100
    x = jnp.asarray(rng.standard_normal((400, C)).astype(np.float32))
    fb = jnp.full((400,), 0.8, jnp.float32)
    buf0 = jnp.zeros((L, C), jnp.float32)
    y_ref, b_ref, p_ref, _ = _comb_ref_const(
        x, fb, buf0, jnp.int32(0), jnp.float32(-1.0), f, L, sr
    )
    ya, ba, pa = comb_const_delay(x[:170], fb[:170], buf0, jnp.int32(0),
                                  d=d, L=L)
    yb, bb, pb = comb_const_delay(x[170:], fb[170:], ba, pa, d=d, L=L)
    np.testing.assert_allclose(
        np.concatenate([ya, yb]), np.asarray(y_ref), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(bb), np.asarray(b_ref), atol=1e-6)
    assert int(pb) == int(p_ref)


def test_comb_pe_fast_path_render_matches_sequential_graph():
    """PE-level: the dispatched fast path equals the scan semantics."""
    src = pg.NoisePE(seed=5)
    pe = pg.CombPE(src, frequency=220.0, feedback=0.8)
    out = np.asarray(pe.render(0, 1024).data)
    # sequential oracle through comb_scan_ref on the same pulled input
    x = np.asarray(pg.NoisePE(seed=5).render(0, 1024).data)

    sr = 44100.0
    L = max(2, int(np.ceil(sr / 20.0)) + 1)
    y, _, _, _ = comb_scan_ref(
        jnp.asarray(x), jnp.full((1024,), jnp.float32(220.0)),
        jnp.full((1024,), jnp.float32(0.8)),
        jnp.zeros((L, x.shape[1]), jnp.float32),
        jnp.int32(0), jnp.float32(-1.0), L=L, sr=sr, smooth_alpha=1 / 2400,
    )
    np.testing.assert_allclose(out, np.asarray(y), atol=1e-6)


# ---- Karplus-Strong ------------------------------------------------------


@pytest.mark.parametrize("T,L", [(700, 200), (96, 200), (700, 17),
                                 (2048, 600)])
def test_ks_block_matches_scan(T, L):
    rng = np.random.default_rng(11)
    c = 0.42
    rho = jnp.asarray(rng.uniform(0.95, 1.0, T).astype(np.float32))
    act = jnp.ones((T,), bool)
    buf = jnp.asarray(rng.standard_normal(L).astype(np.float32) * 0.3)
    r = jnp.int32(rng.integers(0, L))
    y1, b1, r1, ai1, ao1 = ks_scan_ref(
        rho, act, buf, r, jnp.float32(0.0), jnp.float32(0.0),
        L=L, allpass_c=c,
    )
    y2, b2, r2, ai2, ao2 = ks_blocked(
        rho, buf, r, jnp.float32(0.0), jnp.float32(0.0), L=L, allpass_c=c,
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-5)
    assert int(r2) == int(r1)
    np.testing.assert_allclose(float(ai2), float(ai1), atol=1e-5)
    np.testing.assert_allclose(float(ao2), float(ao1), atol=1e-5)


def test_ks_block_integer_period_allpass_c_one():
    """frac == 0 gives allpass_c == 1 (non-decaying alternating chain)."""
    T, L = 1024, 100
    rng = np.random.default_rng(2)
    rho = jnp.full((T,), 0.996, jnp.float32)
    act = jnp.ones((T,), bool)
    buf = jnp.asarray(rng.standard_normal(L).astype(np.float32) * 0.3)
    y1, b1, *_ = ks_scan_ref(
        rho, act, buf, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
        L=L, allpass_c=1.0,
    )
    y2, b2, *_ = ks_blocked(
        rho, buf, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
        L=L, allpass_c=1.0,
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-5)


def test_ks_block_state_continuation():
    T, L, c = 500, 120, 0.3
    rng = np.random.default_rng(9)
    rho = jnp.asarray(rng.uniform(0.9, 1.0, T).astype(np.float32))
    act = jnp.ones((T,), bool)
    buf = jnp.asarray(rng.standard_normal(L).astype(np.float32) * 0.3)
    yr, br, rr, air, aor = ks_scan_ref(
        rho, act, buf, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
        L=L, allpass_c=c,
    )
    ya, ba, ra, aia, aoa = ks_blocked(
        rho[:190], buf, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
        L=L, allpass_c=c,
    )
    yb, bb, rb, aib, aob = ks_blocked(
        rho[190:], ba, ra, aia, aoa, L=L, allpass_c=c,
    )
    np.testing.assert_allclose(
        np.concatenate([ya, yb]), np.asarray(yr), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(bb), np.asarray(br), atol=1e-5)
    assert int(rb) == int(rr)


def test_ks_pe_negative_start_falls_back_and_matches():
    """Mixed-activity render (start < 0) routes to the sequential branch;
    the inactive prefix is silent and doesn't advance the string."""
    mixed = np.asarray(
        pg.KarplusStrongPE(220.0, seed=1).render(-32, 96).data
    )
    active = np.asarray(pg.KarplusStrongPE(220.0, seed=1).render(0, 64).data)
    assert np.all(mixed[:32] == 0.0)
    np.testing.assert_allclose(mixed[32:], active, atol=1e-6)


def test_ks_pe_chunked_matches_oneshot_fast_path():
    one = np.asarray(pg.KarplusStrongPE(220.0, seed=1).render(0, 1024).data)
    pe = pg.KarplusStrongPE(220.0, seed=1)
    parts = [np.asarray(pe.render(s, 128).data) for s in range(0, 1024, 128)]
    np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)


# ---- reverse echo ---------------------------------------------------------


def _revecho(fast, alt=0.0, blk=0.05, fb=0.6, seed=3):
    """ratio as a ConstantPE defeats the static fast path (same math:
    the kernel's near_unity select bypasses the pitch stage either way)."""
    src = pg.NoisePE(seed=seed)
    ratio = 1.0 if fast else pg.ConstantPE(1.0)
    return pg.ReversePitchEchoPE(
        src, block_seconds=blk, pitch_ratio=ratio, feedback=fb,
        alternate_direction=alt, max_delay_seconds=0.2,
    )


@pytest.mark.parametrize("alt", [0.0, 1.0])
def test_revecho_block_matches_sequential(alt):
    a = np.asarray(_revecho(True, alt).render(0, 4000).data)
    b = np.asarray(_revecho(False, alt).render(0, 4000).data)
    assert float(np.sqrt((a ** 2).mean())) > 0.1  # effect actually rings
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_revecho_block_chunked_matches_oneshot():
    one = np.asarray(_revecho(True).render(0, 4000).data)
    # misaligned chunk starts: the fast path handles these itself via its
    # ``off`` grid alignment (ok stays true; no sequential fallback)
    pe = _revecho(True)
    parts = [
        np.asarray(pe.render(s, min(617, 4000 - s)).data)
        for s in range(0, 4000, 617)
    ]
    np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)
    # block-aligned chunks: every chunk takes the fast path
    pe2 = _revecho(True)
    parts2 = [np.asarray(pe2.render(s, 400).data) for s in range(0, 4000, 400)]
    np.testing.assert_allclose(np.concatenate(parts2), one, atol=1e-5)


def test_revecho_non_integer_block_rejects_fast_path():
    """A block length that is not an f32 smoother fixed point must route
    to the sequential path (and still match the PE-param oracle)."""
    a = np.asarray(_revecho(True, blk=0.05003).render(0, 2000).data)
    b = np.asarray(_revecho(False, blk=0.05003).render(0, 2000).data)
    np.testing.assert_allclose(a, b, atol=0.0)  # same sequential trace


def test_revecho_block_state_handoff_across_chunks():
    """Fast-path final state must chain across arbitrary chunk splits:
    every chunk here still takes the fast path (its ``off`` alignment
    absorbs mid-block starts), but the carried state crosses block-grid
    boundaries at three different phases."""
    one = np.asarray(_revecho(True).render(0, 3000).data)
    pe = _revecho(True)
    parts = [
        np.asarray(pe.render(0, 800).data),     # aligned start
        np.asarray(pe.render(800, 1000).data),  # ends mid-block
        np.asarray(pe.render(1800, 1200).data), # starts mid-block
    ]
    np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-5)


def test_revecho_slow_scan_fallback_on_foreign_state():
    """Exercise the ``ok == False`` cond branch (``_slow_scan``): a
    restored checkpoint whose ``smoothed``/``r_idx`` violate the fast
    path's alignment predicate must route to the sequential scan and
    match the PE-param graph (which always runs sequential) restored
    with the SAME perturbed state."""
    from pygmu2_tpu.core import engine

    T1, T2 = 800, 1400
    fast = _revecho(True)
    oracle = _revecho(False)  # PE ratio => sequential path, same math
    np.testing.assert_allclose(
        np.asarray(fast.render(0, T1).data),
        np.asarray(oracle.render(0, T1).data),
        atol=1e-5,
    )

    def perturb(snap):
        (key,) = [k for k in snap if "ReversePitchEchoPE" in k]
        st = dict(snap[key]["user"])
        # smoothed off the fixed point and r_idx != w_idx: both predicate
        # violations; the smoother then drifts back over many blocks, so
        # several subsequent chunks stay on the sequential branch.
        st["smoothed"] = st["smoothed"] + np.float32(7.0)
        st["r_idx"] = np.maximum(st["r_idx"] - 3, 0).astype(st["r_idx"].dtype)
        return {key: {"next": snap[key]["next"], "user": st}}

    sf = perturb(engine.checkpoint_state(fast))
    so = perturb(engine.checkpoint_state(oracle))
    # same perturbed payload under each graph's own structural key
    (kf,) = sf.keys()
    (ko,) = so.keys()
    so = {ko: sf[kf]}
    engine.restore_state(fast, sf)
    engine.restore_state(oracle, so)
    for s, n in ((T1, 300), (T1 + 300, T2 - T1 - 300)):
        a = np.asarray(fast.render(s, n).data)
        b = np.asarray(oracle.render(s, n).data)
        np.testing.assert_allclose(a, b, atol=1e-5)


# ---- ADSR closed form -----------------------------------------------------


from pygmu2_tpu.ops.adsr_block import adsr_closed_form  # noqa: E402
from pygmu2_tpu.ops.adsr_pallas import adsr_scan_ref  # noqa: E402


def _rand_gate(rng, T, toggles):
    g = np.zeros(T, np.float32)
    pos = np.sort(rng.choice(T, toggles, replace=False))
    for i, p in enumerate(pos):
        g[p:] = 1.0 if i % 2 == 0 else 0.0
    return jnp.asarray(g)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_adsr_closed_form_matches_scan_gated(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        T = int(rng.integers(50, 2500))
        at, dt, rt = rng.uniform(0.001, 0.3, 3)
        sl = float(rng.uniform(0.05, 0.95))
        sr = 44100.0
        kw = dict(dA=1 / (at * sr), dD=(sl - 1) / (dt * sr),
                  dR=-sl / (rt * sr), sus=sl)
        g = _rand_gate(rng, T, int(rng.integers(0, 12)))
        st = jnp.zeros((4,), jnp.float32)
        y1, s1 = adsr_scan_ref(g, st, **kw)
        y2, s2 = adsr_closed_form(g, st, **kw)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)


@pytest.mark.parametrize("seed", [5, 6])
def test_adsr_closed_form_matches_scan_triggered(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        T = int(rng.integers(50, 2500))
        at, dt, rt = rng.uniform(0.0005, 0.2, 3)
        sl = float(rng.uniform(0.05, 0.95))
        sr = 44100.0
        kw = dict(dA=1 / (at * sr), dD=(sl - 1) / (dt * sr),
                  dR=-sl / (rt * sr), sus=sl)
        S = int(rng.integers(1, 2000))
        g = np.zeros(T, np.float32)
        for p in rng.choice(T, int(rng.integers(0, 8)), replace=False):
            g[p] = 1.0
        st = jnp.zeros((4,), jnp.float32)
        y1, s1 = adsr_scan_ref(jnp.asarray(g), st, sustain_samples=S, **kw)
        y2, s2 = adsr_closed_form(jnp.asarray(g), st, sustain_samples=S, **kw)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)


def test_adsr_closed_form_chunked_is_bitwise():
    rng = np.random.default_rng(7)
    T = 2400
    kw = dict(dA=1 / 441.0, dD=-0.5 / 882.0, dR=-0.5 / 1323.0, sus=0.5)
    g = _rand_gate(rng, T, 6)
    st = jnp.zeros((4,), jnp.float32)
    yr, _ = adsr_scan_ref(g, st, **kw)
    parts, s = [], st
    for c in range(0, T, 317):
        yc, s = adsr_closed_form(g[c:c + 317], s, **kw)
        parts.append(np.asarray(yc))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(yr),
                               atol=1e-6)


def test_adsr_closed_form_degenerate_params():
    """dD == 0 (sustain_level == 1) and instant attack must match the
    sequential machine's immediate-hit behavior."""
    T = 400
    g = jnp.asarray(np.concatenate([np.zeros(10), np.ones(300),
                                    np.zeros(90)]).astype(np.float32))
    st = jnp.zeros((4,), jnp.float32)
    for kw in (
        dict(dA=1 / 44.1, dD=0.0, dR=-1 / 441.0, sus=1.0),   # dD == 0
        dict(dA=2.0, dD=-0.5 / 44.1, dR=-0.5 / 441.0, sus=0.5),  # 1-step A
    ):
        y1, s1 = adsr_scan_ref(g, st, **kw)
        y2, s2 = adsr_closed_form(g, st, **kw)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)


def test_adsr_tiered_huge_block_routes_to_seq():
    """Blocks >= 2**24 samples exceed the closed form's f32 sample-index
    domain (per-call limit) and must route straight to seq_fn."""
    from pygmu2_tpu.ops.adsr_block import adsr_tiered

    calls = []

    def seq_stub(g, s):
        calls.append(g.shape[0])
        return jnp.zeros(g.shape, jnp.float32), s

    g = jnp.zeros(((1 << 24),), jnp.float32)
    st = jnp.zeros((4,), jnp.float32)
    kw = dict(dA=1 / 44.1, dD=-0.5 / 88.2, dR=-0.5 / 132.3, sus=0.5)
    y, _ = adsr_tiered(g, st, seq_fn=seq_stub, **kw)
    assert calls == [1 << 24]
    assert y.shape == ((1 << 24),)


def test_adsr_pe_dense_gate_falls_back():
    """A square-wave gate with > K_cap edges routes to the sequential
    branch and still matches the per-sample machine."""
    sq = np.tile(np.repeat(np.float32([1.0, 0.0]), 4), 200)  # 400 edges
    g = jnp.asarray(sq)
    st = jnp.zeros((4,), jnp.float32)
    kw = dict(dA=1 / 44.1, dD=-0.5 / 88.2, dR=-0.5 / 132.3, sus=0.5)
    y1, s1 = adsr_scan_ref(g, st, **kw)
    gate_pe = pg.ArrayPE(np.asarray(g)[:, None])
    pe = pg.AdsrGatedPE(gate_pe, attack_time=0.001, decay_time=0.002,
                        sustain_level=0.5, release_time=0.003)
    out = np.asarray(pe.render(0, len(sq)).data)[:, 0]
    assert out.shape == (1600,)
    assert np.isfinite(out).all()
