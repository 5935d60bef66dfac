"""Measure the VPU dependent-op latency floor for serial Mosaic loops.

Grounds the LadderPE floor analysis (BENCHMARKS.md): a kernel whose
fori_loop body is a pure dependent chain of K fused multiply-adds per
trip, N trips. Wall time / (N*K) = result-to-input latency per op. A
serial per-sample recurrence cannot go faster than
(chain ops per sample) * (this latency).

Run on the TPU: python experiments/vpu_latency_floor.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("n", "k", "tanh"))
def chain_kernel(x, *, n, k, tanh=False):
    def kernel(x_ref, y_ref):
        def body(_j, c):
            for _ in range(k):
                if tanh:
                    c = jnp.tanh(c)
                else:
                    c = c * jnp.float32(0.9999) + jnp.float32(1e-7)
            return c

        y_ref[:] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def dev_ms(fn):
    @jax.jit
    def rep(r):
        def body(_i, acc):
            return acc + fn(jnp.full((8, 128), acc * 1e-30, jnp.float32))[0, 0] * 1e-30
        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    float(rep(jnp.int32(1)))
    t1s, t2s = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(rep(jnp.int32(2))); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rep(jnp.int32(10))); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / 8 * 1e3


def main():
    print("backend:", jax.default_backend())
    N = 20000
    base = dev_ms(lambda x: chain_kernel(x, n=N, k=1))
    for k in (2, 8, 16):
        ms = dev_ms(lambda x: chain_kernel(x, n=N, k=k))
        # slope between k=1 and k: marginal latency per dependent fma
        ns_per_op = (ms - base) / (N * (k - 1)) * 1e6
        print(f"fma chain k={k:2d}: {ms:7.3f} ms  -> {ns_per_op:.2f} ns/op marginal")
    t1 = dev_ms(lambda x: chain_kernel(x, n=N, k=1, tanh=True))
    t8 = dev_ms(lambda x: chain_kernel(x, n=N, k=8, tanh=True))
    print(f"tanh chain: {(t8 - t1) / (N * 7) * 1e6:.2f} ns/tanh marginal")


if __name__ == "__main__":
    main()
