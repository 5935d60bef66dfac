"""Wide-phase, narrow-transcendental trig for band-limited oscillators.

float64 ``sin`` is software-emulated on TPU (tens of VPU ops per value);
float32 ``sin`` is native. But a naive f32 cast of the oscillator phase
costs ~6e-8 ABSOLUTE phase error, and the Dirichlet BLIT kernel
sin(mπφ)/sin(πφ) amplifies phase error by its slope (~m² in φ units):
at m≈100 harmonics that is ~6e-4 output error — over the ≤1e-4 parity
budget (reference: src/pygmu2/blit_saw_pe.py:25-299 evaluates in f64).

The fix is to do the *range reduction* wide and only the transcendental
narrow: fold the argument of sin(πx) to its nearest integer in f64, cast
the small residual to f32 (a cast of a small value keeps RELATIVE
precision), and evaluate one native f32 sin on an argument ≤ π/2. Both
BLIT numerator and denominator then carry ~1e-7 relative error
everywhere — including arbitrarily close to the phase wrap — so the
ratio needs no epsilon guard beyond the exact zero.
"""

from __future__ import annotations

import jax.numpy as jnp

from pygmu2_tpu.core import prec


def sinpi_folded(x):
    """sin(π·x) evaluated f32 with ~1e-7 RELATIVE error, from wide ``x``.

    Folds ``x`` to its nearest integer in the input dtype (use f64 for
    phase accumulators), casts the residual r = x − round(x) (|r| ≤ ½)
    to f32, and returns (−1)^round(x) · sin(π·r). Because the cast value
    is small, its f32 representation error is relative — the result is
    accurate even when sin(πx) itself is tiny (x near an integer), where
    a pre-cast of ``x`` would lose everything.
    """
    k = jnp.round(x)
    r = (x - k).astype(prec.AUDIO)
    # (−1)^k without integer conversion: k mod 2 ∈ {0, 1} exactly.
    sign = (1.0 - 2.0 * jnp.mod(k, 2.0)).astype(prec.AUDIO)
    return sign * jnp.sin(jnp.pi * r)


def dirichlet_blit(phase, m, P):
    """AC-coupled Dirichlet BLIT: sin(mπφ)/(P·sin(πφ)) − 1/P, f32 output.

    ``phase``: wide (f64) phase in periods — any real value; only its
    fractional position matters. ``m``: odd harmonic count (wide,
    elementwise). ``P``: period in samples (wide or f32). All shapes
    broadcast. The m·φ product and both foldings run wide, the two sins
    run native f32 (see module docstring). At exact integer phase the
    kernel's limit is m (m odd), substituted through a division guard.
    """
    den = sinpi_folded(phase)
    num = sinpi_folded(m * phase)
    m32 = m.astype(prec.AUDIO)
    P32 = P.astype(prec.AUDIO)
    near_zero = jnp.abs(den) < 1e-12
    safe = jnp.where(near_zero, 1.0, den)
    d = jnp.where(near_zero, m32, num / safe)
    return (d - 1.0) / P32
