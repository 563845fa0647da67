"""Pallas prefix flash attention vs the XLA masked-softmax reference
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from chadavit_tpu.models import channel_padding_mask
from chadavit_tpu.ops.attention import xla_masked_attention
from chadavit_tpu.ops.flash_attention import prefix_flash_attention


@pytest.mark.parametrize("counts", [[1, 10, 3], [2, 2, 2]])
@pytest.mark.parametrize("num_heads,d", [(2, 192), (3, 192)])
def test_prefix_flash_matches_xla(rng, counts, num_heads, d):
    n = 196
    b = len(counts)
    s = 1 + 10 * n  # 1961
    q = rng.standard_normal((b, s, d)).astype(np.float32)
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    cc = jnp.asarray(counts)
    valid_len = 1 + cc * n
    mask = channel_padding_mask(cc, 10, n)

    ref, _ = xla_masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask, num_heads)
    out = prefix_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), valid_len, num_heads, interpret=True
    )

    ref, out = np.asarray(ref), np.asarray(out)
    # compare only valid token positions (padded-query outputs are unused downstream)
    for i, c in enumerate(counts):
        vl = 1 + c * n
        np.testing.assert_allclose(out[i, :vl], ref[i, :vl], rtol=2e-5, atol=2e-5)


def test_prefix_flash_small_shapes(rng):
    # non-multiple-of-block sequence with tiny head_dim
    b, s, d, h = 2, 161, 64, 2
    q = rng.standard_normal((b, s, d)).astype(np.float32)
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    valid_len = jnp.asarray([161, 17])
    mask = jnp.arange(s)[None, :] >= valid_len[:, None]

    ref, _ = xla_masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask, h)
    out = prefix_flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), valid_len, h, interpret=True)
    ref, out = np.asarray(ref), np.asarray(out)
    for i, vl in enumerate([161, 17]):
        np.testing.assert_allclose(out[i, :vl], ref[i, :vl], rtol=2e-5, atol=2e-5)
