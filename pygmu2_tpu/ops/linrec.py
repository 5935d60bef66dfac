"""Linear recurrence kernels (the IIR workhorse).

The reference accelerates sample-serial IIR loops with Numba kernels
(reference: biquad_pe.py:35, svfilter_pe.py:41-106, envelope_pe.py:259).
On TPU the same recurrences are *linear* (even when time-varying), so they
parallelize over the time axis with ``jax.lax.associative_scan`` on affine
maps — O(log T) depth instead of O(T), batched over channels/voices on the
VPU. This module is the shared primitive behind BiquadPE, SVFilterPE,
EnvelopePE's symmetric path, NoisePE's brown/pink filters, and
SlewLimiterPE's exponential mode.

Math: a (possibly time-varying) affine recurrence
    s[t] = A[t] @ s[t-1] + u[t]
is the composition of affine maps (A[t], u[t]); composition
    (A2, u2) ∘ (A1, u1) = (A2 @ A1, A2 @ u1 + u2)
is associative, so the prefix states are an associative scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_scan_1(a, u, s0):
    """First-order affine recurrence ``s[t] = a[t]*s[t-1] + u[t]``.

    Args:
        a: (T, ...) per-step decay (broadcastable against u).
        u: (T, ...) per-step input.
        s0: (...) initial state (state *before* step 0).

    Returns:
        s: (T, ...) states after each step.
    """
    a = jnp.broadcast_to(a, u.shape)
    u = u.at[0].add(a[0] * s0) if s0 is not None else u

    def combine(left, right):
        a1, u1 = left
        a2, u2 = right
        return a1 * a2, a2 * u1 + u2

    _, s = jax.lax.associative_scan(combine, (a, u))
    return s


def affine_scan_2(a11, a12, a21, a22, u1, u2, s0=None):
    """Order-2 affine recurrence in structure-of-arrays form.

        s[t] = [[a11[t], a12[t]], [a21[t], a22[t]]] @ s[t-1] + [u1[t], u2[t]]

    All components are (T, ...) arrays (broadcastable). Returns
    (s1, s2): the two state components after each step, shape (T, ...).
    Avoids any (..., 2, 2)-shaped array — trailing tiny dims are padded
    to full tiles on TPU and inflate traffic ~100×.
    """
    if s0 is not None:
        s01, s02 = s0
        u1 = u1.at[0].add(a11[0] * s01 + a12[0] * s02)
        u2 = u2.at[0].add(a21[0] * s01 + a22[0] * s02)

    def combine(left, right):
        a1, b1, c1, d1, p1, q1 = left
        a2, b2, c2, d2, p2, q2 = right
        return (
            a2 * a1 + b2 * c1,
            a2 * b1 + b2 * d1,
            c2 * a1 + d2 * c1,
            c2 * b1 + d2 * d1,
            a2 * p1 + b2 * q1 + p2,
            c2 * p1 + d2 * q1 + q2,
        )

    a11, a12, a21, a22, u1, u2 = jnp.broadcast_arrays(a11, a12, a21, a22, u1, u2)
    out = jax.lax.associative_scan(combine, (a11, a12, a21, a22, u1, u2))
    return out[4], out[5]


def affine_scan_2_auto(a11, a12, a21, a22, u1, u2, s0=None):
    """affine_scan_2 with accuracy/throughput routing: the single-HBM-pass
    Mosaic kernel (ops/linrec_pallas.py) for wide batches on TPU, the
    segmented scan (:func:`affine_scan_2_seg`) for long narrow windows.

    The associative scan runs ~log2(T) *global* passes, each streaming
    six (T, C) planes through HBM; the blocked Kogge-Stone kernel reads
    every plane exactly once and its cost is C-independent up to the
    128-lane tile. Measured A/B on the v5e (experiments/
    ab_linrec_paths.py, chained-dispatch amortized): the kernel wins
    0.45-0.6x at C >= 8, is a wash at C = 2, and LOSES 1.25-2x at C = 1
    — mono audio leaves 127 of its 128 lanes idle while the associative
    scan's log-passes stay cheap. Route: kernel only for C >= 4 wide
    batches on long windows; everything else (and non-TPU backends)
    keeps the associative scan. The kernel carries the scan-replay VJP,
    so gradients are unchanged either way.
    """
    from pygmu2_tpu.ops.diffable import kernel_interpret, kernel_path_enabled

    u1a = jnp.asarray(u1)
    if u1a.ndim == 2:
        if (
            kernel_path_enabled()
            and u1a.shape[0] >= 4096
            and 4 <= u1a.shape[1] <= 128
        ):
            from pygmu2_tpu.ops.linrec_pallas import affine_scan_2_pallas

            return affine_scan_2_pallas(
                a11, a12, a21, a22, u1, u2, s0,
                chunk=1024, interpret=kernel_interpret(),
            )
        # Narrow batches (mono/stereo PE filters) at EVERY length: the
        # segmented Kogge-Stone scan — the kernel's numerics without the
        # kernel's idle lanes, and one structure across block sizes so
        # chunked and one-shot renders agree to genuine f32 rounding.
        return affine_scan_2_seg(a11, a12, a21, a22, u1, u2, s0=s0)
    return affine_scan_2(a11, a12, a21, a22, u1, u2, s0=s0)


def affine_scan_2_seg(a11, a12, a21, a22, u1, u2, s0=None, *, seg: int = 512):
    """Order-2 affine scan, segmented for accuracy AND narrow batches.

    The flat associative scan composes up to T near-unit 2x2 maps in
    f32; at pole radii ~0.997 (a 200 Hz Q=2 biquad) the composed-map
    rounding blows up to ~0.6 absolute output error. This variant
    bounds every f32 map composition to ``seg`` steps:

    1. reshape (T, C) -> (L, S, C) segments and run the associative
       scan WITHIN each segment (parallel over L·C, log2(S) passes);
    2. stitch segment-final maps through a length-L ``lax.scan`` that
       propagates the STATE VALUE (2 fused multiply-adds per step — no
       long map products ever form);
    3. apply each segment's per-sample prefix map to its incoming state
       (elementwise).

    Same math as :func:`affine_scan_2`; error growth is that of the
    chunked Mosaic kernel (ops/linrec_pallas.py). Preferred on narrow
    batches (C < 4) where the kernel would idle 124+ of its 128 lanes;
    measured on the v5e it is also ~1.4x faster than the flat scan at
    (44100, 1) because log passes shrink from log2(T) to log2(seg).
    """
    a11, a12, a21, a22, u1, u2 = jnp.broadcast_arrays(
        a11, a12, a21, a22, u1, u2
    )
    T, C = u1.shape
    seg = min(seg, max(T, 1))
    L = -(-T // seg)
    pad = L * seg - T

    def prep(x, fill):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad, C), fill, x.dtype)], axis=0
            )
        return x.reshape(L, seg, C)

    # identity-map padding keeps the tail segment's stitch exact
    m11, m12 = prep(a11, 1.0), prep(a12, 0.0)
    m21, m22 = prep(a21, 0.0), prep(a22, 1.0)
    v1, v2 = prep(u1, 0.0), prep(u2, 0.0)

    # Explicit Kogge-Stone within segments (axis=1), mirroring the
    # Mosaic kernel's inner scan op-for-op. NOT lax.associative_scan:
    # its balanced recursion is measurably unstable for near-unit-radius
    # maps under XLA compilation (0.4 absolute error on an 8k-sample
    # resonant sweep where this form — like the kernel — stays ~1e-4;
    # see tests/test_linrec_pallas.py's sequential-oracle test).
    s = 1
    while s < seg:
        def sh(x, fill):
            top = jnp.full((L, s, C), fill, x.dtype)
            return jnp.concatenate([top, x[:, :-s]], axis=1)

        p11, p12 = sh(m11, 1.0), sh(m12, 0.0)
        p21, p22 = sh(m21, 0.0), sh(m22, 1.0)
        q1, q2 = sh(v1, 0.0), sh(v2, 0.0)
        n11 = m11 * p11 + m12 * p21
        n12 = m11 * p12 + m12 * p22
        n21 = m21 * p11 + m22 * p21
        n22 = m21 * p12 + m22 * p22
        v1 = m11 * q1 + m12 * q2 + v1
        v2 = m21 * q1 + m22 * q2 + v2
        m11, m12, m21, m22 = n11, n12, n21, n22
        s *= 2

    if s0 is None:
        c1 = jnp.zeros((C,), u1.dtype)
        c2 = jnp.zeros((C,), u1.dtype)
    else:
        c1 = jnp.broadcast_to(jnp.asarray(s0[0], u1.dtype), (C,))
        c2 = jnp.broadcast_to(jnp.asarray(s0[1], u1.dtype), (C,))
    # inherit the inputs' varying-mesh-axes type: under shard_map a
    # fresh-zeros carry is "unvarying" while the stitch body's output is
    # varying, and lax.scan rejects the mismatch. Both components hang
    # off u1 — u2 is often itself a fresh-zeros constant (biquad_filter)
    # and would not carry the vma type.
    c1 = c1 + u1[0] * 0
    c2 = c2 + u1[0] * 0

    finals = tuple(x[:, -1] for x in (m11, m12, m21, m22, v1, v2))

    def stitch(carry, f):
        x1, x2 = carry
        f11, f12, f21, f22, g1, g2 = f
        return (
            (f11 * x1 + f12 * x2 + g1, f21 * x1 + f22 * x2 + g2),
            (x1, x2),  # emit the state ENTERING this segment
        )

    _, (in1, in2) = jax.lax.scan(stitch, (c1, c2), finals)

    s1 = m11 * in1[:, None] + m12 * in2[:, None] + v1
    s2 = m21 * in1[:, None] + m22 * in2[:, None] + v2
    s1 = s1.reshape(L * seg, C)[:T]
    s2 = s2.reshape(L * seg, C)[:T]
    return s1, s2


def affine_scan_nd(A, u, s0):
    """D-dimensional affine recurrence ``s[t] = A[t] @ s[t-1] + u[t]``.

    Args:
        A: (T, ..., D, D) per-step transition matrices.
        u: (T, ..., D) per-step inputs.
        s0: (..., D) initial state, or None for zeros.

    Returns:
        s: (T, ..., D) states after each step.

    D == 2 (the IIR case) uses fully unrolled elementwise arithmetic —
    tiny batched matmuls lower poorly on TPU (dot_general with huge batch
    dims); as plain VPU mul/add the scan both compiles and runs fast.
    """
    if s0 is not None:
        if A.shape[-1] == 2:
            a = A[0]
            extra = jnp.stack(
                [
                    a[..., 0, 0] * s0[..., 0] + a[..., 0, 1] * s0[..., 1],
                    a[..., 1, 0] * s0[..., 0] + a[..., 1, 1] * s0[..., 1],
                ],
                axis=-1,
            )
        else:
            extra = jnp.einsum("...ij,...j->...i", A[0], s0)
        u = u.at[0].add(extra)

    if A.shape[-1] == 2:
        # Structure-of-arrays: scan six (T, ...) component arrays instead
        # of (T, ..., 2, 2) — trailing dims of 2 get padded to full TPU
        # tiles (8×128), inflating memory traffic ~100×. As flat
        # components every array keeps its natural layout.
        comp = (
            A[..., 0, 0],
            A[..., 0, 1],
            A[..., 1, 0],
            A[..., 1, 1],
            u[..., 0],
            u[..., 1],
        )

        def combine(left, right):
            a1, b1, c1, d1, p1, q1 = left
            a2, b2, c2, d2, p2, q2 = right
            return (
                a2 * a1 + b2 * c1,
                a2 * b1 + b2 * d1,
                c2 * a1 + d2 * c1,
                c2 * b1 + d2 * d1,
                a2 * p1 + b2 * q1 + p2,
                c2 * p1 + d2 * q1 + q2,
            )

        out = jax.lax.associative_scan(combine, comp)
        return jnp.stack([out[4], out[5]], axis=-1)

    def combine(left, right):
        A1, u1 = left
        A2, u2 = right
        return (
            jnp.einsum("...ij,...jk->...ik", A2, A1),
            jnp.einsum("...ij,...j->...i", A2, u1) + u2,
        )

    _, s = jax.lax.associative_scan(combine, (A, u))
    return s


def biquad_filter(x, b0, b1, b2, a1, a2, zi=None):
    """Direct-form-I biquad, batched over channels, parallel over time.

        y[n] = b0·x[n] + b1·x[n−1] + b2·x[n−2] − a1·y[n−1] − a2·y[n−2]

    The FIR half vectorizes directly; the feedback half is the order-2
    affine recurrence A[n] = [[−a1, −a2], [1, 0]], u[n] = [fir[n], 0],
    solved with the associative scan. DF1 matches the reference's
    time-varying semantics exactly (coefficients apply at the output
    sample; DF2T would smear them across steps).

    Args:
        x: (T, C) input.
        b0..a2: scalars or (T,) / (T, 1) arrays (time-varying OK).
        zi: carried state dict {"x": (2, C) last two inputs [x[-1], x[-2]],
            "y": (2, C) last two outputs}, or None for zeros.

    Returns:
        (y, zf): (T, C) output and the carried state for the next block.
    """
    T, C = x.shape
    dt = x.dtype

    def tv(c):
        arr = jnp.asarray(c, dtype=dt)
        if arr.ndim == 0:
            return jnp.broadcast_to(arr, (T, 1))
        return arr.reshape(T, -1)

    b0, b1, b2, a1, a2 = tv(b0), tv(b1), tv(b2), tv(a1), tv(a2)

    if zi is None:
        x_tail = jnp.zeros((2, C), dt)
        y_tail = jnp.zeros((2, C), dt)
    else:
        x_tail = jnp.asarray(zi["x"], dt)
        y_tail = jnp.asarray(zi["y"], dt)

    # FIR half on [x[-2], x[-1], x[0..T)] — fully parallel.
    xp = jnp.concatenate([x_tail[::-1], x], axis=0)  # rows: x[-2], x[-1], x...
    fir = b0 * xp[2:] + b1 * xp[1:-1] + b2 * xp[:-2]

    y, _ = affine_scan_2_auto(
        jnp.broadcast_to(-a1, (T, C)),
        jnp.broadcast_to(-a2, (T, C)),
        jnp.ones((T, C), dt),
        jnp.zeros((T, C), dt),
        fir,
        jnp.zeros((T, C), dt),
        s0=(y_tail[0], y_tail[1]),
    )

    zf = {
        "x": jnp.stack([x[-1], x[-2] if T >= 2 else x_tail[0]], axis=0),
        "y": jnp.stack([y[-1], y[-2] if T >= 2 else y_tail[0]], axis=0),
    }
    return y, zf


def one_pole_smooth(x, coef, s0=None):
    """Exponential smoother ``y[t] = y[t-1] + coef[t]·(x[t] − y[t-1])``.

    coef may be per-sample (time-varying). Returns (y, y_final).
    """
    coef = jnp.broadcast_to(jnp.asarray(coef, x.dtype), x.shape)
    a = 1.0 - coef
    u = coef * x
    y = affine_scan_1(a, u, s0)
    return y, y[-1]


def clamp_accum_scan(d, lo, hi, s0):
    """Saturating accumulator ``y[t] = clamp(y[t-1] + d[t], lo, hi)``,
    exactly, as an associative scan (O(log T) depth instead of a
    per-sample loop).

    The per-step map ``f(y) = clamp(y + s, L, H)`` is closed under
    composition:

        clamp(clamp(y + s1, L1, H1) + s2, L2, H2)
          = clamp(y + s1 + s2, clamp(L1 + s2, L2, H2),
                               clamp(H1 + s2, L2, H2))

    (the standard nested-clamp identity, valid whenever L1 <= H1 and
    L2 <= H2 — both preserved by the combine), so the triple
    ``(s, L, H)`` is an associative monoid element. This parallelizes
    the reference's per-sample brown-noise integrator
    (reference: src/pygmu2/noise_pe.py:150-171) and any other
    clipped-running-sum recurrence.

    Args:
        d: (T, ...) per-step increments.
        lo / hi: scalar clamp bounds (static floats).
        s0: (...) state before step 0.

    Returns:
        y: (T, ...) states after each step.
    """
    d = jnp.asarray(d)
    L0 = jnp.full_like(d, lo)
    H0 = jnp.full_like(d, hi)

    def combine(left, right):
        s1, l1, h1 = left
        s2, l2, h2 = right
        return (
            s1 + s2,
            jnp.clip(l1 + s2, l2, h2),
            jnp.clip(h1 + s2, l2, h2),
        )

    S, L, H = jax.lax.associative_scan(combine, (d, L0, H0))
    return jnp.clip(s0 + S, L, H)
