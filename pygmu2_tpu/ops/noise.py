"""Counter-based noise primitives.

The reference's NoisePE draws from a stateful numpy Generator (reference:
src/pygmu2/noise_pe.py:28-171). Stateful RNG serializes on TPU, so white
noise here is a *counter-based* hash of (seed, absolute sample index):
stateless, block-invariant (chunked rendering equals one-shot), and
embarrassingly parallel. Pink/brown colors filter that white stream.
"""

from __future__ import annotations

import jax.numpy as jnp


def _fmix32(x):
    """murmur3 finalizer — a well-mixed 32-bit hash (vectorized)."""
    x = jnp.asarray(x, dtype=jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def white_uniform(t, seed: int = 0, lane: int = 0):
    """Uniform noise in [-1, 1) indexed by absolute sample position.

    Args:
        t: int array of absolute sample indices (any shape).
        seed: stream seed.
        lane: sub-stream index (e.g. channel or voice) so parallel streams
            decorrelate.
    """
    tt = jnp.asarray(t)
    lo = (tt & 0xFFFFFFFF).astype(jnp.uint32)
    hi = ((tt >> 32) & 0xFFFFFFFF).astype(jnp.uint32)
    s = jnp.uint32((seed * 0x9E3779B9 + lane * 0x85EBCA6B + 0x27D4EB2F) & 0xFFFFFFFF)
    x = _fmix32(lo ^ s)
    x = _fmix32(x ^ hi ^ (s * jnp.uint32(0x01000193)))
    # 32-bit value → [-1, 1)
    return (x.astype(jnp.float32) * (2.0 ** -31)) - 1.0


def white_uniform_np(t, seed: int = 0, lane: int = 0):
    """Numpy mirror of white_uniform — bit-identical, for host-side
    precomputations (e.g. TralfamPE's one-time spectral scramble)."""
    import numpy as np

    tt = np.asarray(t)
    lo = (tt & 0xFFFFFFFF).astype(np.uint32)
    hi = ((tt >> 32) & 0xFFFFFFFF).astype(np.uint32)
    s = np.uint32((seed * 0x9E3779B9 + lane * 0x85EBCA6B + 0x27D4EB2F) & 0xFFFFFFFF)

    def fmix(x):
        x = x ^ (x >> np.uint32(16))
        x = (x * np.uint32(0x7FEB352D)).astype(np.uint32)
        x = x ^ (x >> np.uint32(15))
        x = (x * np.uint32(0x846CA68B)).astype(np.uint32)
        x = x ^ (x >> np.uint32(16))
        return x

    with np.errstate(over="ignore"):
        x = fmix(lo ^ s)
        x = fmix(x ^ hi ^ np.uint32((int(s) * 0x01000193) & 0xFFFFFFFF))
    return (x.astype(np.float32) * np.float32(2.0**-31)) - np.float32(1.0)
