import numpy as np
import pytest


def pytest_configure(config):
    # force the CPU backend before anything initializes it (the axon
    # sitecustomize ignores JAX_PLATFORMS set later; see tests/conftest.py)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
