"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# deterministic, full-precision matmuls on CPU
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
# persistent compile cache: CPU jit of the scan-based models is slow
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# the environment's axon plugin force-registers itself ("axon,cpu") and wins
# over the env var; an explicit config update takes priority.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
