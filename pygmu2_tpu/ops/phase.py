"""Blocked phase accumulation: wide bases, narrow prefix sums.

A flat float64 ``cumsum`` over (T,) phase increments is
software-emulated on TPU (~log T tree passes of double-f32 arithmetic)
and dominated the modulated-SinePE row. The split here keeps the
drift-free part wide and the per-sample part narrow:

- local f32 cumsums within ``block``-row tiles (phase accumulated over
  <=1024 samples stays tiny, so its f32 error is ~1e-6 in phase units);
- an f64 cumsum over the <=T/block block totals (all the multi-hour
  drift protection, at ~T/1024 emulated adds);
- the base is wrapped to the modulus in f64 BEFORE the f32 cast, so the
  cast costs relative-of-modulus (~4e-7), not relative-of-total-phase.

Suitable for phase consumers whose output slope in phase units is O(1)
(sin, piecewise-linear waveforms). NOT for the Dirichlet BLIT, whose
kernel amplifies phase error by ~m^2 (see ops/trig.py) — those paths
keep the full f64 accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp

from pygmu2_tpu.core import prec


def wrapped_phase_accum(acc, inc, modulus: float, *, exclusive: bool = False,
                        block: int = 1024):
    """(phase32, final_wide): phase[t] = mod(acc + prefix(inc)[t], modulus).

    Args:
        acc: scalar wide carried phase entering the window.
        inc: (T,) wide per-sample increments.
        modulus: wrap period (1.0 for normalized phase, 2*pi for radians).
        exclusive: False -> prefix includes inc[t] (phase AFTER the step,
            the SinePE convention); True -> phase BEFORE the step.

    Returns:
        phase32: (T,) f32 wrapped phase in [0, modulus).
        final_wide: scalar wide acc + sum(inc) — the drift-free carry
            (NOT wrapped; callers mod it as their state convention needs).
    """
    (T,) = inc.shape
    Tp = -(-T // block) * block
    incp = jnp.pad(inc, (0, Tp - T))
    xb = incp.reshape(Tp // block, block)
    loc = jnp.cumsum(xb.astype(jnp.float32), axis=1)  # (B, block) f32
    totals = xb.sum(axis=1)  # (B,) wide — exact block sums
    base = jnp.cumsum(totals)  # (B,) wide, inclusive
    final = acc + base[-1]
    base_excl = jnp.concatenate([jnp.zeros((1,), prec.WIDE), base[:-1]])
    # Wrap the wide part per block, THEN cast: the f32 value is small.
    base32 = jnp.mod(acc + base_excl, modulus).astype(jnp.float32)
    if exclusive:
        shifted = jnp.concatenate(
            [jnp.zeros_like(loc[:, :1]), loc[:, :-1]], axis=1
        )
        loc = shifted
    phase = base32[:, None] + loc
    phase = jnp.mod(phase, jnp.float32(modulus)).reshape(Tp)[:T]
    return phase, final
