"""Batched overlap-save FFT convolution primitive.

Shared by ConvolvePE and SpatialHRTF (reference counterparts:
src/pygmu2/convolve_pe.py:285-340, spatial_pe.py:465-519 — both sequential
overlap-save loops with carried tails). Here the caller supplies the input
window including the (L−1)-sample history, and every frame transforms in
one batched rfft — no sequential dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def framed_conv(x_window, h, out_len: int, nfft: int | None = None):
    """Convolve with history: returns ``y[t] = Σ_k h[k]·x[t−k]``.

    Args:
        x_window: (out_len + L − 1, C) input covering the history; row
            L−1 corresponds to output sample 0.
        h: (L, C) or (L, 1) FIR (broadcasts over channels when mono).
        out_len: number of output samples.
        nfft: FFT size (≥ L); default next_pow2(max(2048, L)).

    Returns:
        (out_len, C) float32 output.
    """
    L = h.shape[0]
    tail = L - 1
    C = x_window.shape[1]

    if jax.default_backend() == "tpu":
        # XLA's TPU FFT lowers to dense DFT matmuls (a (4096,)-batch
        # rfft+irfft measured 11 ms; non-pow2 sizes try to materialize
        # an (N, N) matrix). The MXU has a native convolution path that
        # is both faster and exact — use it on TPU.
        hrev = h[::-1]  # cross-correlation with reversed taps == conv
        if h.shape[1] == 1 and C > 1:
            hrev = jnp.broadcast_to(hrev, (L, C))
        lhs = x_window.T[None].astype(jnp.float32)        # (1, C, W)
        rhs = hrev.T[:, None, :].astype(jnp.float32)      # (C, 1, L)
        y = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding="VALID",
            feature_group_count=C,
        )[0].T  # (W - L + 1, C) == (out_len, C)
        return y[:out_len].astype(jnp.float32)

    if nfft is None:
        nfft = next_pow2(max(2048, L))
    hop = nfft - tail
    n_frames = -(-out_len // hop)

    pad = n_frames * hop + nfft - (out_len + tail)
    xp = jnp.concatenate(
        [x_window, jnp.zeros((pad, C), x_window.dtype)], axis=0
    )
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(nfft)[None, :]
    frames = xp[idx]  # (n_frames, nfft, C)

    H = jnp.fft.rfft(h, n=nfft, axis=0)  # (bins, hC)
    X = jnp.fft.rfft(frames, axis=1)
    if h.shape[1] == 1:
        Y = X * H[None, :, 0:1]
    else:
        Y = X * H[None]
    y = jnp.fft.irfft(Y, n=nfft, axis=1)
    valid = y[:, tail : tail + hop, :].reshape(n_frames * hop, -1)
    return valid[:out_len].astype(jnp.float32)
