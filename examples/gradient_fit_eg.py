"""Differentiable synthesis with ParamPE: fit patch parameters by
gradient descent against a target sound.

No reference counterpart — the reference's eager NumPy interpreter
cannot differentiate a render. Here the whole graph compiles to one XLA
program whose ParamPE values are jit *arguments*, so:

* ``jax.grad`` gives exact gradients of any loss of the rendered audio
  with respect to the parameters;
* every optimization step re-runs the SAME compiled program (no
  retrace);
* ``jax.vmap`` can render whole batches of candidate patches at once.

This example "ear-matches" a two-parameter patch (oscillator gain and
lowpass cutoff) to a target rendered with hidden values.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pygmu2_tpu as pg
from pygmu2_tpu.core import engine

pg.set_sample_rate(44100)

N = 4096
BLOCK = 1024


def patch(gain, cutoff):
    """A small subtractive patch; params may be floats or ParamPEs."""
    osc = pg.BlitSawPE(frequency=110.0)
    filt = pg.BiquadPE(osc, cutoff, 0.707, mode=pg.BiquadMode.LOWPASS)
    return pg.CropPE(pg.GainPE(filt, gain), 0, N)


# --- the target: rendered with parameters we'll pretend not to know ---
TRUE_GAIN, TRUE_CUTOFF = 0.42, 1300.0
target = jnp.asarray(pg.render_to_array(patch(TRUE_GAIN, TRUE_CUTOFF)))

# --- the fit graph: same patch, parameters as ParamPEs ---
fit_graph = patch(
    pg.ParamPE("gain", default=0.1),
    pg.ParamPE("cutoff", default=3000.0),
)


def loss(theta):
    # optimize in well-scaled space: raw gain, log-cutoff. The binding
    # values are traced expressions of theta, so gradients chain
    # through the exp for free.
    binds = {"gain": theta["gain"], "cutoff": jnp.exp(theta["log_cutoff"])}
    out = engine.render_functional(fit_graph, 0, N, BLOCK, binds)
    return jnp.mean((out - target) ** 2)


import optax

opt = optax.adam(0.05)
theta = {"gain": jnp.float32(0.1), "log_cutoff": jnp.log(jnp.float32(3000.0))}
state = opt.init(theta)
val_and_grad = jax.jit(jax.value_and_grad(loss))

for step in range(300):
    v, g = val_and_grad(theta)
    updates, state = opt.update(g, state)
    theta = optax.apply_updates(theta, updates)
    if step % 50 == 0:
        print(
            f"step {step:3d}  loss {float(v):.3e}  "
            f"gain {float(theta['gain']):.3f}  "
            f"cutoff {float(jnp.exp(theta['log_cutoff'])):7.1f}"
        )

fit_gain = float(theta["gain"])
fit_cutoff = float(jnp.exp(theta["log_cutoff"]))
print(
    f"\nfitted gain   {fit_gain:.3f}  (true {TRUE_GAIN})"
    f"\nfitted cutoff {fit_cutoff:7.1f}  (true {TRUE_CUTOFF})"
)
assert abs(fit_gain - TRUE_GAIN) < 0.05
assert abs(fit_cutoff - TRUE_CUTOFF) < 150.0

# --- bonus: vmap a bank of cutoff candidates in ONE launch ---
cutoffs = jnp.linspace(500.0, 4000.0, 8, dtype=jnp.float32)
batch = jax.vmap(
    lambda c: engine.render_functional(
        fit_graph, 0, N, BLOCK, {"gain": jnp.float32(TRUE_GAIN), "cutoff": c}
    )
)(cutoffs)
errs = jnp.mean((batch - target[None]) ** 2, axis=(1, 2))
best = int(jnp.argmin(errs))
print(f"\nvmap sweep: best of 8 candidates = {float(cutoffs[best]):.0f} Hz")
np.testing.assert_array_less(float(errs[best]), float(errs[0]))
