"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the pure-JAX oracle paths are CPU-runnable, an
improvement over the reference whose tests GTEST_SKIP without CUDA)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; pin the config directly so tests run on local CPU instead of
# dispatching op-by-op over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA compiles dominate test time on small hosts.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
