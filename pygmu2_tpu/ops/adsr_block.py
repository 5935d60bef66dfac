"""Closed-form (gate-edge-parallel) ADSR evaluation.

The gated/triggered ADSR (reference: src/pygmu2/adsr_pe.py:124-193) is a
per-sample state machine, but its transitions depend only on the GATE
INPUT (known for the whole block up front) and on deterministic clip
crossings of linear ramps — never on the output. Between two gate edges
the trajectory is a fixed chain of linear phases:

    gated      ATTACK -> clip 1 -> DECAY -> SUSTAIN        (rising edge)
               RELEASE -> clip 0 -> IDLE                   (falling edge)
    triggered  ATTACK -> DECAY -> SUSTAIN(n_s) -> RELEASE -> IDLE

so the whole render factors into: (1) find the gate edges (vectorized),
(2) a tiny scan over the EDGES — typically a handful per block — that
propagates the envelope value across segments and precomputes each
segment's phase table, (3) one fully vectorized per-sample evaluation.

Exactness: phase values are computed with the count-based scheme of
``ops/adsr_pallas.py`` (``env = base + n * dvdt``, one f32 rounding per
sample regardless of segment length), and clip-crossing counts are found
by evaluating the kernel's own comparison (``e0 + n1*d >= 1`` etc.) on a
+-2 window around the algebraic estimate — so the discrete transition
samples match the sequential kernel exactly. Same <2^24-samples-per-
segment domain as the kernel.

A ``lax.cond`` guards the edge-count cap: pathological gates (more than
``K_cap`` edges in one block) fall back to the sequential path.

Pure jnp: every backend, natively differentiable (w.r.t. nothing — the
envelope depends only on static params and the gate's sign pattern; the
gradient w.r.t. the gate is zero almost everywhere, as in the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_IDLE, _ATTACK, _DECAY, _SUSTAIN, _RELEASE = 0.0, 1.0, 2.0, 3.0, 4.0
_FAR = 1e30  # phase offset sentinel: never reached


def _first_crossing(e0, n_start, d: float, thresh: float, ge: bool):
    """Smallest integer n1 >= n_start with f32(e0 + n1*d) >= thresh (ge)
    or <= thresh (le), matching the kernel's per-step comparison. e0 and
    n_start are traced f32 scalars; d/thresh are static floats. Returns
    an integer-valued f32 (``_FAR``-ish when the ramp never crosses)."""
    d32 = jnp.float32(d)
    th = jnp.float32(thresh)
    est = (th - e0) / d32  # real crossing; f32 eval lands within +-1
    base = jnp.where(
        jnp.isfinite(est),
        jnp.maximum(jnp.floor(est) - 2.0, n_start),
        n_start,
    )
    cand = base + jnp.arange(6, dtype=jnp.float32)
    val = e0 + cand * d32  # the kernel's expression, verbatim
    okv = (val >= th) if ge else (val <= th)
    okv = okv & (cand >= n_start)
    return jnp.min(jnp.where(okv, cand, jnp.float32(_FAR)))


def _chain(stage0, e00, n00, *, dA, dD, dR, sus, ss):
    """Phase table for one segment from entering state (stage0, e00,
    n00): rows (offs, bases, n0s, slopes, stages), each (5,) f32.
    ``env(tau) = base[p] + (n0[p] + tau - off[p]) * slope[p]`` for
    ``tau in [off[p], off[p+1])``. ``ss`` is None for gated."""
    one = jnp.float32(1.0)
    f = jnp.float32
    n1 = n00 + 1.0

    m_a = _first_crossing(e00, n1, dA, 1.0, ge=True)
    m_d = _first_crossing(e00, n1, dD, sus, ge=False)
    m_r = _first_crossing(e00, n1, dR, 0.0, ge=False)
    n_d1 = _first_crossing(one, one, dD, sus, ge=False)  # decay-from-1
    a_end = m_a - n00
    d_end = m_d - n00
    r_end = m_r - n00

    def tab(offs, bases, n0s, slopes, stages):
        return jnp.stack(
            [jnp.stack([f(v) if not hasattr(v, "dtype") else v
                        for v in row]) for row in
             (offs, bases, n0s, slopes, stages)]
        )  # (5 rows, 5 phases)

    FAR = f(_FAR)
    if ss is None:  # gated: SUSTAIN and IDLE are terminal
        t_att = tab(
            (0.0, a_end, a_end + n_d1, FAR, FAR),
            (e00, 1.0, sus, sus, sus),
            (n00, 0.0, 0.0, 0.0, 0.0),
            (dA, dD, 0.0, 0.0, 0.0),
            (_ATTACK, _DECAY, _SUSTAIN, _SUSTAIN, _SUSTAIN),
        )
        t_dec = tab(
            (0.0, d_end, FAR, FAR, FAR),
            (e00, sus, sus, sus, sus),
            (n00, 0.0, 0.0, 0.0, 0.0),
            (dD, 0.0, 0.0, 0.0, 0.0),
            (_DECAY, _SUSTAIN, _SUSTAIN, _SUSTAIN, _SUSTAIN),
        )
        t_sus = tab(
            (0.0, FAR, FAR, FAR, FAR),
            (sus, sus, sus, sus, sus),
            (n00, 0.0, 0.0, 0.0, 0.0),
            (0.0, 0.0, 0.0, 0.0, 0.0),
            (_SUSTAIN,) * 5,
        )
    else:  # triggered: SUSTAIN expires after ss steps, then RELEASE
        s_len = float(max(1, int(ss)))
        n_r_sus = _first_crossing(f(sus), one, dR, 0.0, ge=False)
        t_att = tab(
            (0.0, a_end, a_end + n_d1, a_end + n_d1 + s_len,
             a_end + n_d1 + s_len + n_r_sus),
            (e00, 1.0, sus, sus, 0.0),
            (n00, 0.0, 0.0, 0.0, 0.0),
            (dA, dD, 0.0, dR, 0.0),
            (_ATTACK, _DECAY, _SUSTAIN, _RELEASE, _IDLE),
        )
        t_dec = tab(
            (0.0, d_end, d_end + s_len, d_end + s_len + n_r_sus, FAR),
            (e00, sus, sus, 0.0, 0.0),
            (n00, 0.0, 0.0, 0.0, 0.0),
            (dD, 0.0, dR, 0.0, 0.0),
            (_DECAY, _SUSTAIN, _RELEASE, _IDLE, _IDLE),
        )
        # first n1 > n00 with n1 >= ss
        sus_rem = jnp.maximum(n1, f(float(int(ss)))) - n00
        t_sus = tab(
            (0.0, sus_rem, sus_rem + n_r_sus, FAR, FAR),
            (sus, sus, 0.0, 0.0, 0.0),
            (n00, 0.0, 0.0, 0.0, 0.0),
            (0.0, dR, 0.0, 0.0, 0.0),
            (_SUSTAIN, _RELEASE, _IDLE, _IDLE, _IDLE),
        )
    t_rel = tab(
        (0.0, r_end, FAR, FAR, FAR),
        (e00, 0.0, 0.0, 0.0, 0.0),
        (n00, 0.0, 0.0, 0.0, 0.0),
        (dR, 0.0, 0.0, 0.0, 0.0),
        (_RELEASE, _IDLE, _IDLE, _IDLE, _IDLE),
    )
    t_idle = tab(
        (0.0, FAR, FAR, FAR, FAR),
        (0.0,) * 5,
        (n00, 0.0, 0.0, 0.0, 0.0),
        (0.0,) * 5,
        (_IDLE,) * 5,
    )
    return jnp.where(
        stage0 == _ATTACK,
        t_att,
        jnp.where(
            stage0 == _DECAY,
            t_dec,
            jnp.where(
                stage0 == _SUSTAIN,
                t_sus,
                jnp.where(stage0 == _RELEASE, t_rel, t_idle),
            ),
        ),
    )


def _eval(table, tau):
    """Evaluate a phase table at tau (f32, scalar or (...,)). table is
    (5, 5) for scalar tau or (..., 5, 5) matching tau's batch shape.
    Returns (env, stage, e_base, n_count)."""
    offs, bases, n0s, slopes, stages = (
        table[..., 0, :], table[..., 1, :], table[..., 2, :],
        table[..., 3, :], table[..., 4, :],
    )
    ph = jnp.sum(tau[..., None] >= offs, axis=-1) - 1
    ph = jnp.clip(ph, 0, 4)[..., None]
    off = jnp.take_along_axis(offs, ph, axis=-1)[..., 0]
    base = jnp.take_along_axis(bases, ph, axis=-1)[..., 0]
    n0 = jnp.take_along_axis(n0s, ph, axis=-1)[..., 0]
    slope = jnp.take_along_axis(slopes, ph, axis=-1)[..., 0]
    stage = jnp.take_along_axis(stages, ph, axis=-1)[..., 0]
    n = n0 + (tau - off)
    env = base + n * slope
    return env, stage, base, n


@functools.partial(
    jax.jit,
    static_argnames=("dA", "dD", "dR", "sus", "sustain_samples", "K_cap"),
)
def adsr_closed_form(gate, state, *, dA, dD, dR, sus,
                     sustain_samples=None, K_cap: int = 128):
    """gate: (T,) f32; state: (4,) f32 = (stage, e0, n, prev_gate) — the
    ``ops/adsr_pallas.py`` layout. Returns (env (T,), new_state (4,)).
    Requires the block's edge count <= K_cap (callers guard with
    :func:`adsr_edge_count` and a ``lax.cond``)."""
    T = gate.shape[0]
    g = gate.astype(jnp.float32)
    gated = sustain_samples is None
    kw = dict(dA=dA, dD=dD, dR=dR, sus=sus,
              ss=None if gated else sustain_samples)

    if gated:
        pgv = jnp.concatenate([state[3][None], g[:-1]])
        rising = (pgv == 0.0) & (g == 1.0)
        falling = (pgv == 1.0) & (g == 0.0)
        edge = rising | falling
    else:
        rising = g > 0.0
        edge = rising
    # edge positions WITHOUT jnp.nonzero (its size= lowering sorts the
    # whole array — measured ~4 ms for T=44100 on TPU, dominating
    # everything else). rank = running edge count; the k-th edge index
    # is an exact one-hot contraction on the MXU.
    m_i = jnp.arange(T, dtype=jnp.int32)
    rank = jnp.cumsum(edge.astype(jnp.int32))  # edges <= m, inclusive
    count = rank[T - 1]
    hi = jax.lax.Precision.HIGHEST
    edge_onehot = (
        (rank[:, None] == jnp.arange(1, K_cap + 1, dtype=jnp.int32)[None, :])
        & edge[:, None]
    ).astype(jnp.float32)  # (T, K): row m hot in col k iff m is edge k
    eidx_f = jnp.matmul(
        m_i.astype(jnp.float32)[None, :], edge_onehot, precision=hi
    )[0]  # exact: one nonzero term per column
    eidx = jnp.where(
        jnp.arange(K_cap, dtype=jnp.int32) < count,
        eidx_f.astype(jnp.int32),
        jnp.int32(T),
    )

    tab0 = _chain(state[0], state[1], state[2], **kw)
    start0 = jnp.int32(0)
    rise_at = jnp.concatenate([rising, jnp.ones((1,), bool)])  # pad for fills

    def body(carry, pk):
        table, start = carry
        tau_e = (pk - start).astype(jnp.float32)
        env_e, _, _, _ = _eval(table, tau_e)
        stage_e = jnp.where(
            rise_at[jnp.clip(pk, 0, T)],
            jnp.float32(_ATTACK),
            jnp.float32(_RELEASE),
        )
        new_tab = _chain(stage_e, env_e, jnp.float32(0.0), **kw)
        return (new_tab, pk), (new_tab, pk)

    (_, _), (tabs_k, starts_k) = jax.lax.scan(body, (tab0, start0), eidx)
    tabs = jnp.concatenate([tab0[None], tabs_k])        # (K+1, 5, 5)
    starts = jnp.concatenate([start0[None], starts_k])  # (K+1,)

    # per-sample evaluation: the edge sample itself still emits the OLD
    # segment's value (the kernel emits before retargeting). Per-sample
    # table rows are fetched with an exact one-hot contraction on the
    # MXU instead of a gather (OPTIMIZING.md rule 1: scalar gathers cost
    # ~7 ns/element — 25 table entries x T samples would dominate);
    # one-hot weights are 0/1 so the f32 dot is bitwise the gather.
    m = m_i
    # segment id: edges strictly BEFORE m (the edge sample itself still
    # emits the OLD segment — the kernel emits before retargeting)
    sid = jnp.clip(rank - edge.astype(jnp.int32), 0, K_cap)
    seg_onehot = (
        jnp.arange(K_cap + 1, dtype=jnp.int32)[None, :] == sid[:, None]
    ).astype(jnp.float32)  # (T, K+1)
    flat = jnp.concatenate(
        [tabs.reshape(K_cap + 1, 25),
         starts.astype(jnp.float32)[:, None]],
        axis=1,
    )  # (K+1, 26): 5x5 table + segment start
    rows = jnp.matmul(seg_onehot, flat, precision=hi)  # (T, 26)
    offs, bases = rows[:, 0:5], rows[:, 5:10]
    n0s, slopes = rows[:, 10:15], rows[:, 15:20]
    tau = m.astype(jnp.float32) - rows[:, 25]
    ph = jnp.clip(jnp.sum(tau[:, None] >= offs, axis=1) - 1, 0, 4)
    pick = (
        jnp.arange(5, dtype=jnp.int32)[None, :] == ph[:, None]
    ).astype(jnp.float32)  # (T, 5) one-hot phase select, exact
    off = jnp.sum(offs * pick, axis=1)
    base = jnp.sum(bases * pick, axis=1)
    n0 = jnp.sum(n0s * pick, axis=1)
    slope = jnp.sum(slopes * pick, axis=1)
    env = base + (n0 + (tau - off)) * slope

    # final state: entering-sample state after all T steps
    last_tab = tabs[jnp.clip(count, 0, K_cap)]
    last_start = starts[jnp.clip(count, 0, K_cap)]
    tau_T = (jnp.int32(T) - last_start).astype(jnp.float32)
    _, stage_T, e_T, n_T = _eval(last_tab, tau_T)
    new_state = jnp.stack([stage_T, e_T, n_T, g[T - 1]])
    return env.astype(jnp.float32), new_state


def adsr_tiered(gate, state, *, seq_fn, sustain_samples=None,
                K_tiers=(8, 32), **kw):
    """Edge-count-tiered dispatch: the closed form's edge scan costs
    ~15 us per K_cap SLOT on TPU regardless of the actual edge count
    (measured: K=8 -> 402 Msmp/s, K=32 -> 115, K=128 -> 24, vs the
    sequential Mosaic kernel's 29), so pick the smallest cap that fits
    this block's edges and fall through to ``seq_fn`` (the sequential
    kernel) only for pathological gates. All tiers are exact — same
    count-based f32 arithmetic — so the tier choice never changes the
    output.

    Domain guard: the closed form extracts edge positions (and per-sample
    tau) via f32 one-hot contractions of SAMPLE indices, exact only while
    every index < 2**24 — a PER-CALL limit, stricter than the per-segment
    one documented in the module docstring. Blocks at or past 2**24
    samples (~380 s at 44.1 kHz in one call) route straight to the
    sequential kernel, which has no such limit."""
    if gate.shape[0] >= (1 << 24):
        return seq_fn(gate, state)
    gated = sustain_samples is None
    nedges = adsr_edge_count(gate, state[3], gated=gated)
    k1, k2 = K_tiers

    def c1(g, s):
        return adsr_closed_form(
            g, s, sustain_samples=sustain_samples, K_cap=k1, **kw)

    def c2(g, s):
        return adsr_closed_form(
            g, s, sustain_samples=sustain_samples, K_cap=k2, **kw)

    def mid(g, s):
        return jax.lax.cond(nedges <= k2, c2, seq_fn, g, s)

    return jax.lax.cond(nedges <= k1, c1, mid, gate, state)


def adsr_edge_count(gate, prev_gate, *, gated: bool):
    """Number of retargeting edges in this block (for the K_cap guard)."""
    g = gate.astype(jnp.float32)
    if gated:
        pgv = jnp.concatenate([prev_gate[None], g[:-1]])
        return jnp.sum(((pgv == 0.0) & (g == 1.0))
                       | ((pgv == 1.0) & (g == 0.0)))
    return jnp.sum(g > 0.0)
