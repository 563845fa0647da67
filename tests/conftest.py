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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
