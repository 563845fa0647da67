"""Fused LayerNorm kernel (fwd + custom VJP) vs flax/XLA reference."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes of tracing on CPU

import jax
import jax.numpy as jnp

from chadavit_tpu.ops.layernorm import (fused_layernorm,
                                        fused_layernorm_residual, layernorm)


def _ref_ln(x, gamma, beta, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, -1, keepdims=True) - mu * mu, 0.0)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


@pytest.fixture
def data(rng):
    x = jnp.asarray(rng.standard_normal((3, 50, 192)).astype(np.float32)) * 2 + 1
    r = jnp.asarray(rng.standard_normal((3, 50, 192)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(192).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(192).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((3, 50, 192)).astype(np.float32))
    return x, r, gamma, beta, cot


def test_fused_layernorm_fwd_bwd(data):
    x, _, gamma, beta, cot = data
    y_ref, vjp_ref = jax.vjp(lambda a, g, b: _ref_ln(a, g, b), x, gamma, beta)
    y, vjp = jax.vjp(lambda a, g, b: fused_layernorm(a, g, b, 1e-5, True),
                     x, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    for got, want, n in zip(vjp(cot), vjp_ref(cot), "xgb"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=n)


def test_fused_layernorm_residual_fwd_bwd(data):
    x, r, gamma, beta, cot = data
    y_ref, vjp_ref = jax.vjp(lambda a, rr, g, b: _ref_ln(a + rr, g, b),
                             x, r, gamma, beta)
    y, vjp = jax.vjp(
        lambda a, rr, g, b: fused_layernorm_residual(a, rr, g, b, 1e-5, True),
        x, r, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    for got, want, n in zip(vjp(cot), vjp_ref(cot), "xrgb"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=n)


def test_layernorm_matches_flax(data):
    """The dispatching xla path reproduces flax.linen.LayerNorm exactly."""
    from flax import linen as nn

    x, _, gamma, beta, _ = data
    flax_ln = nn.LayerNorm(epsilon=1e-5)
    y_flax = flax_ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    y = layernorm(x, gamma, beta, 1e-5, impl="xla")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_flax), atol=1e-6)


def test_layernorm_odd_row_count(rng):
    """Row counts that don't divide the block size pad correctly."""
    x = jnp.asarray(rng.standard_normal((7, 11, 64)).astype(np.float32))
    gamma = jnp.ones(64)
    beta = jnp.zeros(64)
    y = fused_layernorm(x, gamma, beta, 1e-5, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_ln(x, gamma, beta)),
                               atol=2e-5)
