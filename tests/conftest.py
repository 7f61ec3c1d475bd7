"""Test configuration: force CPU with 8 virtual devices so data/tensor
parallel semantics (pmean grads, sharded eval, collective metrics) are
testable without a TPU pod (SURVEY.md §4).

Note: this environment pins JAX_PLATFORMS=axon (a TPU tunnel); the env var
is overridden at plugin-registration time, so the only reliable override is
``jax.config.update('jax_platforms', 'cpu')`` before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU compiles are expensive on this
# single-core box; cache them across pytest runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
