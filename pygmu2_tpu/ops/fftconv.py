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

    if nfft is None:
        # 2L, not L: nfft == next_pow2(L) degenerates to hop == 1 when L
        # is a power of two (16k single-sample frames for a 2048-tap FIR
        # — measured 313 ms vs 13 ms). Output is identical for any
        # nfft >= L; this only picks a sane hop.
        nfft = next_pow2(max(2048, 2 * L))
    hop = nfft - tail
    n_frames = -(-out_len // hop)

    pad = n_frames * hop + nfft - (out_len + tail)
    xp = jnp.concatenate(
        [x_window, jnp.zeros((pad, C), x_window.dtype)], axis=0
    )
    # (n_frames, C, nfft): the FFT axis MUST be minor — on TPU a
    # middle-axis FFT over a trailing singleton channel dim gets
    # tile-padded 128x and ran ~30x slower.
    if tail <= hop:
        # Frame i is xp[i*hop : i*hop + nfft]. With tail <= hop (always
        # true for the default nfft >= 2L) the overlapping windows are
        # two reshapes of static slices — an index-array gather here
        # lowers to a ~7 ns/element scalar loop on TPU and cost half
        # the ConvolvePE row.
        a = xp[: n_frames * hop].reshape(n_frames, hop, C)
        b = xp[hop : hop + n_frames * hop].reshape(n_frames, hop, C)
        frames = jnp.concatenate([a, b[:, :tail]], axis=1)
    else:  # caller-forced tiny nfft: fall back to the gather
        idx = (
            jnp.arange(n_frames)[:, None] * hop
            + jnp.arange(nfft)[None, :]
        )
        frames = xp[idx]
    frames = jnp.transpose(frames, (0, 2, 1))

    H = jnp.fft.rfft(h.T, n=nfft, axis=-1)  # (hC, bins)
    X = jnp.fft.rfft(frames, axis=-1)       # (n_frames, C, bins)
    if h.shape[1] == 1:
        Y = X * H[None, 0:1, :]
    else:
        Y = X * H[None]
    y = jnp.fft.irfft(Y, n=nfft, axis=-1)   # (n_frames, C, nfft)
    valid = jnp.transpose(y[:, :, tail : tail + hop], (0, 2, 1)).reshape(
        n_frames * hop, -1
    )
    return valid[:out_len].astype(jnp.float32)
