"""ops.table one-hot lookups must be bit-exact vs direct indexing.

Each case runs twice: the CPU native-gather shortcut AND (via
FORCE_DEVICE_PATHS) the TPU one-hot / row-gather code, so the device
paths stay covered by CPU CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygmu2_tpu.ops import table as tbl
from pygmu2_tpu.ops.table import paired_table_lookup, table_lookup


@pytest.fixture(params=[False, True], ids=["native", "device-path"])
def force(request, monkeypatch):
    monkeypatch.setattr(tbl, "FORCE_DEVICE_PATHS", request.param)
    return request.param


def test_table_lookup_exact_small(force):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(1398).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1398, (7, 13, 64), dtype=np.int32))
    got = jax.jit(table_lookup)(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table)[np.asarray(idx)])


def test_table_lookup_exact_large_fallback(force):
    rng = np.random.default_rng(1)
    # > 32 * 128 entries -> row-gather fallback path
    table = jnp.asarray(rng.standard_normal(10_000).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 10_000, (5, 301), dtype=np.int32))
    got = jax.jit(table_lookup)(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table)[np.asarray(idx)])


def test_paired_lookup_shares_index(force):
    rng = np.random.default_rng(2)
    wave = rng.standard_normal(513).astype(np.float32)
    pair = jnp.asarray(np.stack([wave, np.roll(wave, -1)], axis=1))
    idx = jnp.asarray(rng.integers(0, 512, (1000,), dtype=np.int32))
    w0, w1 = jax.jit(paired_table_lookup)(pair, idx)
    np.testing.assert_array_equal(np.asarray(w0), wave[np.asarray(idx)])
    np.testing.assert_array_equal(np.asarray(w1), wave[np.asarray(idx) + 1])


def test_boundary_rows(force):
    # indices on row boundaries (k*128 - 1, k*128) and the last entry
    table = jnp.asarray(np.arange(1398, dtype=np.float32))
    edges = [0, 127, 128, 255, 256, 1023, 1024, 1396, 1397]
    idx = jnp.asarray(np.array(edges, dtype=np.int32))
    got = jax.jit(table_lookup)(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.array(edges, dtype=np.float32))
