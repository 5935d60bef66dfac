"""Stage timing for ops/adsr_block.adsr_closed_form on the live backend.

Times the full closed form at several K_cap values, plus ablations:
edge-index extraction only, scan only, eval only. Chained inside one
jitted fori_loop per OPTIMIZING.md rule 1 (no per-call dispatch).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.ops.adsr_block import adsr_closed_form

T = 44100
kw = dict(dA=1 / 441.0, dD=-0.4 / 2205.0, dR=-0.6 / 4410.0, sus=0.6)

rng = np.random.default_rng(0)
g = np.zeros(T, np.float32)
# 4 edges, like PeriodicGate(2 Hz) over 1 s
for i, p in enumerate(sorted(rng.choice(T, 4, replace=False))):
    g[p:] = 1.0 if i % 2 == 0 else 0.0
g = jnp.asarray(g)
st = jnp.zeros((4,), jnp.float32)


def chain(fn, n):
    @jax.jit
    def run(x0):
        def body(_, c):
            y, s = fn(g, c)
            return s + 0.0 * y[0]
        return jax.lax.fori_loop(0, n, body, x0)
    return run


def time_amortized(fn, label):
    r4, r28 = chain(fn, 4), chain(fn, 28)
    r4(st).block_until_ready(); r28(st).block_until_ready()
    t4 = min(
        _t(lambda: r4(st).block_until_ready()) for _ in range(3)
    )
    t28 = min(
        _t(lambda: r28(st).block_until_ready()) for _ in range(3)
    )
    per = (t28 - t4) / 24
    print(f"{label:42s} {per*1e3:8.3f} ms/call  {T/per/1e6:8.1f} Msmp/s")


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


for K in (8, 32, 128):
    time_amortized(
        lambda gg, ss, K=K: adsr_closed_form(gg, ss, K_cap=K, **kw),
        f"closed_form K_cap={K}",
    )
