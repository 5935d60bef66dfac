"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so that CI needs
no TPU and multi-chip sharding tests have a mesh to run on. Must be set
before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (overriding JAX_PLATFORMS=cpu), which would silently route every
# test computation through the TPU tunnel. Force CPU back on.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: re-running the suite skips recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pygmu2_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pygmu2_tpu as pg  # noqa: E402


@pytest.fixture(autouse=True)
def _set_sample_rate():
    """Every test starts from the canonical 44.1 kHz global rate
    (mirrors the reference's autouse fixture, tests/conftest.py:5-9)."""
    pg.set_sample_rate(44100)
    yield
