"""A/B: affine_scan_2 (associative scan) vs affine_scan_2_pallas (Mosaic
single-HBM-pass) across (T, C) shapes, amortized device time via a jitted
fori_loop chain (OPTIMIZING.md rule 1).

Run on the TPU: python experiments/ab_linrec_paths.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.ops.linrec import affine_scan_2
from pygmu2_tpu.ops.linrec_pallas import affine_scan_2_pallas


def dev_ms(fn, args, k1=4, k2=28):
    @jax.jit
    def chain(k):
        def body(_i, acc):
            out = fn(*[a + acc * 1e-30 if a.dtype == jnp.float32 else a for a in args])
            return acc + (out[0].sum() + out[1].sum()) * 1e-30
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(chain(jnp.int32(2)))
    best = None
    for k_hi in (k2, 252):
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.perf_counter(); float(chain(jnp.int32(k1))); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(chain(jnp.int32(k_hi))); t2s.append(time.perf_counter() - t0)
        diff = min(t2s) - min(t1s)
        if diff >= 0.02:
            return diff / (k_hi - k1) * 1e3
        best = diff / (k_hi - k1) * 1e3
    return best


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for T, C in [(16384, 1), (16384, 2), (16384, 8), (16384, 128), (44100, 1), (131072, 1), (131072, 16)]:
        a11 = jnp.asarray(rng.uniform(0.5, 0.99, (T, C)).astype(np.float32))
        a12 = jnp.asarray(rng.uniform(-0.3, 0.3, (T, C)).astype(np.float32))
        a21 = jnp.asarray(rng.uniform(-0.3, 0.3, (T, C)).astype(np.float32))
        a22 = jnp.asarray(rng.uniform(0.5, 0.99, (T, C)).astype(np.float32))
        u1 = jnp.asarray(rng.normal(0, 1, (T, C)).astype(np.float32))
        u2 = jnp.asarray(rng.normal(0, 1, (T, C)).astype(np.float32))
        args = (a11, a12, a21, a22, u1, u2)

        ms_assoc = dev_ms(lambda *a: affine_scan_2(*a, s0=None), args)
        ms_pall = dev_ms(
            lambda *a: affine_scan_2_pallas(*a, None, chunk=1024, interpret=False),
            args,
        )
        print(
            f"T={T:7d} C={C:4d}  assoc {ms_assoc:8.3f} ms  "
            f"pallas {ms_pall:8.3f} ms  ratio {ms_pall / max(ms_assoc, 1e-9):.2f}x"
        )


if __name__ == "__main__":
    main()
