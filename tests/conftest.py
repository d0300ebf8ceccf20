"""Test env: force a virtual 8-device CPU mesh before jax initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"    # force: never run tests on the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# A sitecustomize in some dev environments imports jax at interpreter start
# (registering a tunneled TPU backend), so the env vars above can be read
# too late — force the platform through the live config as well, BEFORE any
# backend initializes. Without this, the "8-device CPU mesh" silently
# collapses to the single real TPU chip.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend, got " + jax.default_backend())

# Persistent compilation cache: this machine has ONE cpu core, so XLA compiles
# dominate test time. Cache every executable (no min-time/min-size gates) so
# repeat runs of the suite skip compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
