"""Test configuration: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding semantics (psum centering, EMA, pjit shardings) are exercised without
TPU hardware — the JAX-native analogue of multi-node testing (SURVEY §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the env presets axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# this environment force-selects the 'axon' TPU platform regardless of
# JAX_PLATFORMS; override through the config API
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated tiny-model compiles across tests and
# across runs hit the cache instead of recompiling (the entry-point smokes
# alone cost ~10 min of XLA compiles cold)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # function-scoped: every test gets the SAME deterministic stream regardless
    # of which other tests ran before (a shared session generator made test
    # numerics order-dependent — gradient-parity tolerances flaked only under
    # the full suite)
    return np.random.default_rng(0)
