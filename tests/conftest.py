"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment's sitecustomize registers a remote `axon` TPU backend and
pins JAX_PLATFORMS=axon, overriding the env var — so we must also flip the
platform via jax.config *before* any backend initializes. pytest imports
conftest before collecting test modules, which is early enough.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA-on-1-CPU compiles are the dominant test
# cost here; cache them across runs.
_cache_dir = os.environ.get("JAX_TEST_CACHE", "/tmp/jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
