"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the in-process fake-mesh layer called for by SURVEY.md §4.3 — multi-chip
sharding tests run on host CPU devices, so the whole distributed suite runs in
one process with no TPU attached.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The jaxtyping pytest plugin imports jax before this conftest runs, so the env
# var above can be read too late — force the platform through the live config
# as well (backends initialize lazily, so this still lands in time).
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

# Persistent compilation cache: the suite compiles many shard_map programs
# (every ClusterNode serves a mesh-sharded index now); caching them across
# runs roughly halves repeat-suite wall clock.
jax.config.update("jax_compilation_cache_dir", "/tmp/gvdb_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
