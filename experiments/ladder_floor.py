"""Latency-floor analysis for the Moog ladder kernel (VERDICT r4 task 1a).

The ladder is a truly serial recurrence: each output sample needs the
previous sample's four stage states. Per 2x-oversampled substep the
dependency chain is: feedback arithmetic (~4 serial ops) -> ONE tanh
(the input saturator; the 4 stages themselves are linear) -> 4
sequential stages of ~4 serial FMA-class ops each. Nothing can
vectorize across time, so the per-sample floor is the *latency* (not
throughput) of that chain on one VPU lane group.

This experiment measures, on the real chip:
  1. the latency of a serial tanh chain (a Mosaic kernel computing
     x = tanh(x) N times in registers) -> ns per chained tanh;
  2. the latency of a serial FMA chain, same harness -> ns per FMA;
  3. the measured ladder kernel throughput (ns/sample) via the
     chained-dispatch methodology (OPTIMIZING.md rule 1b).

Floor model per output sample (os_n = 2 oversampling):
    t_floor = os_n * (1 * t_tanh + ~20 * t_fma)
(interp 2 + feedback 4 + 4 stages x ~3.5). The comparison t_measured
vs t_floor says how much of the kernel is irreducible dependency
latency vs loop machinery.

Run: python experiments/ladder_floor.py   (on the TPU backend)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(n_ops: int, op: str):
    def kernel(x_ref, y_ref):
        def body(_j, x):
            if op == "tanh":
                return jnp.tanh(x)
            return x * jnp.float32(0.999) + jnp.float32(1e-6)

        y_ref[:] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_ops), body, x_ref[:]
        )

    return kernel


def chain_ns_per_op(op: str, n_lo: int = 4096, n_hi: int = 65536) -> float:
    """ns per serially-chained op, differenced over two chain lengths
    (cancels launch + loop setup)."""
    x = jnp.full((8, 128), 0.3, jnp.float32)

    def run(n):
        f = pl.pallas_call(
            _chain_kernel(n, op),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        g = jax.jit(lambda v: f(v).sum())
        float(g(x))  # compile + warm
        reps = 8
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                float(g(x))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    t_lo, t_hi = run(n_lo), run(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e9


def ladder_ns_per_sample(T: int = 65536) -> float:
    import numpy as np

    from pygmu2_tpu.ops.ladder_pallas import ladder_scan_pallas

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (T, 1)).astype("float32")
    )
    al = jnp.full((T,), 0.12, jnp.float32)
    qa = jnp.full((T,), 1.8, jnp.float32)
    ki = jnp.full((T,), 4.0, jnp.float32)
    dsc = jnp.full((T,), 1.0, jnp.float32)
    st = jnp.zeros((9, 1), jnp.float32)

    @jax.jit
    def chain(k):
        def body(_i, carry):
            acc, s = carry
            y, s2 = ladder_scan_pallas(
                x + acc * 1e-30, al, qa, ki, dsc, s,
                os_n=2, pbg=0.5, mode_index=0,
                input_threshold=1e-5, state_decay=0.999,
            )
            return acc + y[-1, 0] * 1e-30, s2

        return jax.lax.fori_loop(
            jnp.int32(0), k, body, (jnp.float32(0.0), st)
        )[0]

    float(chain(jnp.int32(2)))  # compile + warm

    def run(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(jnp.int32(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = 2, 12
    return (run(k2) - run(k1)) / (k2 - k1) / T * 1e9


def main():
    print(f"backend: {jax.default_backend()}")
    t_tanh = chain_ns_per_op("tanh")
    t_fma = chain_ns_per_op("fma")
    print(f"serial tanh latency: {t_tanh:.2f} ns/op")
    print(f"serial fma latency:  {t_fma:.2f} ns/op")
    os_n, tanhs, fmas = 2, 5, 10
    floor = os_n * (tanhs * t_tanh + fmas * t_fma)
    print(
        f"ladder dependency floor: {os_n} substeps x "
        f"({tanhs} tanh + {fmas} fma) = {floor:.1f} ns/sample "
        f"-> {1e3 / floor * 1e6 / 44100:.0f}x realtime ceiling"
    )
    meas = ladder_ns_per_sample()
    print(
        f"measured ladder kernel: {meas:.1f} ns/sample "
        f"({1e9 / meas / 1e6:.1f} Msmp/s, "
        f"{1e9 / meas / 44100:.0f}x realtime), "
        f"{meas / floor:.2f}x the dependency floor"
    )


if __name__ == "__main__":
    main()
