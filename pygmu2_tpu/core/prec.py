"""Precision policy.

The reference framework computes control/phase math in float64 and emits
float32 audio (reference: src/pygmu2/snippet.py:43, sine_pe.py:134-147).
On TPU, float64 is software-emulated — acceptable for the tiny fraction of
work that is phase/time arithmetic, and required to hold the ≤1e-4 parity
budget over long renders. Audio paths stay float32 (VPU/MXU native).

``jax_enable_x64`` is turned on at import; all dtypes in this codebase are
explicit, so the global flag only widens what we deliberately widen.
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: graph programs recompile only when the
# graph changes, across processes. Critical on remote-compile TPU targets
# where a cold XLA compile can take minutes.
_cache_dir = os.environ.get(
    "PYGMU2_TPU_CACHE", os.path.expanduser("~/.cache/pygmu2_tpu_xla")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax without the knobs
    pass

import jax.numpy as jnp  # noqa: E402

# Audio sample dtype (device-native).
AUDIO = jnp.float32
# High-precision dtype for phase accumulation / time math.
WIDE = jnp.float64
# Absolute sample indices. int64 so multi-hour timelines don't wrap.
INDEX = jnp.int64
