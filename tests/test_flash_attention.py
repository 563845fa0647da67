"""Pallas prefix flash attention (fwd + custom VJP) vs the XLA masked-softmax
reference (interpret mode on CPU; the same kernels compile on TPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes of tracing on CPU

import jax
import jax.numpy as jnp

from chadavit_tpu.models import channel_padding_mask
from chadavit_tpu.ops.attention import xla_masked_attention
from chadavit_tpu.ops.flash_attention import prefix_flash_attention


def _inputs(rng, counts, n, d, cmax):
    b = len(counts)
    s = 1 + cmax * n
    q = rng.standard_normal((b, s, d)).astype(np.float32)
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    cc = jnp.asarray(counts)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 1 + cc * n, channel_padding_mask(cc, cmax, n)


@pytest.mark.parametrize("counts", [[1, 10, 3], [2, 2, 2]])
@pytest.mark.parametrize("num_heads,d", [(2, 192), (3, 192)])
def test_prefix_flash_matches_xla(rng, counts, num_heads, d):
    q, k, v, valid_len, mask = _inputs(rng, counts, 196, d, 10)
    ref, _ = xla_masked_attention(q, k, v, mask, num_heads)
    out = prefix_flash_attention(q, k, v, valid_len, num_heads, 256, True)

    ref, out = np.asarray(ref), np.asarray(out)
    # compare only valid token positions (padded-query outputs are unused downstream)
    for i, vl in enumerate(np.asarray(valid_len)):
        np.testing.assert_allclose(out[i, :vl], ref[i, :vl], rtol=2e-5, atol=2e-5)


def test_prefix_flash_small_shapes(rng):
    b, s, d, h = 2, 161, 64, 2
    q = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    valid_len = jnp.asarray([161, 17])
    mask = jnp.arange(s)[None, :] >= valid_len[:, None]

    ref, _ = xla_masked_attention(q, k, v, mask, h)
    out = prefix_flash_attention(q, k, v, valid_len, h, 256, True)
    ref, out = np.asarray(ref), np.asarray(out)
    for i, vl in enumerate([161, 17]):
        np.testing.assert_allclose(out[i, :vl], ref[i, :vl], rtol=2e-5, atol=2e-5)


def test_prefix_flash_gradients_match_xla(rng):
    """Custom VJP vs autodiff through the XLA path. The scalar loss reads only
    valid positions — exactly how the model consumes attention outputs — so
    padded-block gradient skipping must be invisible."""
    counts = [1, 4, 10]
    n, d, h = 49, 96, 2  # cmax=10 -> s = 491
    q, k, v, valid_len, mask = _inputs(rng, counts, n, d, 10)
    w = jnp.asarray(rng.standard_normal((len(counts), 1 + 10 * n, d)).astype(np.float32))
    valid_cols = ~mask  # (B, S)

    def loss_xla(q, k, v):
        out, _ = xla_masked_attention(q, k, v, mask, h)
        return jnp.sum(jnp.where(valid_cols[..., None], out * w, 0.0))

    def loss_flash(q, k, v):
        out = prefix_flash_attention(q, k, v, valid_len, h, 256, True)
        return jnp.sum(jnp.where(valid_cols[..., None], out * w, 0.0))

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)

    for name, a, b_ in zip("qkv", g_ref, g_out):
        a, b_ = np.asarray(a), np.asarray(b_)
        np.testing.assert_allclose(b_, a, rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_prefix_flash_head_grouping(rng):
    """Wide models (H*hd_pad > MAX_GROUP_LANES) split into head groups —
    the ChAdaViT-B/16 path (D=768, 12 heads, hd=64 -> padded 128)."""
    from chadavit_tpu.ops import flash_attention as fa

    b, s, d, h = 2, 300, 768, 12
    q = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    valid_len = jnp.asarray([300, 120])
    mask = jnp.arange(s)[None, :] >= valid_len[:, None]
    assert len(fa._head_groups(h, 128)) == 4  # 3 heads per 384-lane group

    ref, _ = xla_masked_attention(q, k, v, mask, h)
    out = prefix_flash_attention(q, k, v, valid_len, h, 256, True)
    for i, vl in enumerate([300, 120]):
        np.testing.assert_allclose(np.asarray(out)[i, :vl], np.asarray(ref)[i, :vl],
                                   rtol=2e-5, atol=2e-5)

    # gradients through the grouped path
    w = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    valid_cols = ~mask

    def loss_flash(q, k, v):
        o = prefix_flash_attention(q, k, v, valid_len, h, 256, True)
        return jnp.sum(jnp.where(valid_cols[..., None], o * w, 0.0))

    def loss_xla(q, k, v):
        o, _ = xla_masked_attention(q, k, v, mask, h)
        return jnp.sum(jnp.where(valid_cols[..., None], o * w, 0.0))

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_pick_block():
    from chadavit_tpu.ops.flash_attention import pick_block

    assert pick_block(2048) == 256   # w=10 pad
    assert pick_block(1792) == 256   # w=9: 7*256
    assert pick_block(1408) == 128   # w=7: 11*128
    assert pick_block(640) == 128    # w=3: 5*128
    assert pick_block(512) == 256
    assert pick_block(197) == 256    # non-multiple: kernel pads internally


def test_prefix_flash_block128(rng):
    """128-block kernels (the odd-128-multiple sequence path: w in {3,7})
    match XLA forward and backward."""
    counts = [3, 1, 2]
    n, d, h = 196, 96, 2
    cmax = 3  # s = 589 -> model pads to 640 = 5*128
    q, k, v, valid_len, mask = _inputs(rng, counts, n, d, cmax)
    s_pad = 640
    q = jnp.pad(q, ((0, 0), (0, s_pad - q.shape[1]), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, s_pad - k.shape[1]), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, s_pad - v.shape[1]), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, s_pad - mask.shape[1])), constant_values=True)

    ref, _ = xla_masked_attention(q, k, v, mask, h)
    out = prefix_flash_attention(q, k, v, valid_len, h, 128, True)
    for i, vl in enumerate(np.asarray(valid_len)):
        np.testing.assert_allclose(np.asarray(out)[i, :vl], np.asarray(ref)[i, :vl],
                                   rtol=2e-5, atol=2e-5)

    w = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    valid_cols = ~mask

    def loss(attn_fn):
        def f(q, k, v):
            o = attn_fn(q, k, v)
            return jnp.sum(jnp.where(valid_cols[..., None], o * w, 0.0))
        return f

    g_ref = jax.grad(loss(lambda q, k, v: xla_masked_attention(q, k, v, mask, h)[0]),
                     argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(lambda q, k, v: prefix_flash_attention(q, k, v, valid_len, h, 128, True)),
                     argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_prefix_flash_sharded_matches_xla_tp_mesh(rng):
    """Head/batch-sharded flash attention (shard_map over a {data:4, model:2}
    virtual mesh — VERDICT r3 item #5) matches XLA forward AND backward.
    This is the kernel path TP/FSDP training keeps instead of falling back to
    unfused XLA attention (train/pretrain.py wires shard_mesh)."""
    from chadavit_tpu.ops.attention import prefix_flash_attention_sharded
    from chadavit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_model=2)  # {data: 4, model: 2} on the virtual devices
    counts = [1, 4, 2, 3, 1, 2, 4, 3]  # B=8 divides data=4
    n, d, h = 16, 64, 2  # heads divide model axis; S = 1 + 4*16 = 65
    q, k, v, valid_len, mask = _inputs(rng, counts, n, d, 4)

    ref, _ = xla_masked_attention(q, k, v, mask, h)
    out = prefix_flash_attention_sharded(q, k, v, valid_len, h, mesh,
                                         block=256, interpret=True)
    for i, vl in enumerate(np.asarray(valid_len)):
        np.testing.assert_allclose(np.asarray(out)[i, :vl], np.asarray(ref)[i, :vl],
                                   rtol=2e-5, atol=2e-5)

    w = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    valid_cols = ~mask

    def loss(attn_fn):
        def f(q, k, v):
            o = attn_fn(q, k, v)
            return jnp.sum(jnp.where(valid_cols[..., None], o * w, 0.0))
        return f

    g_ref = jax.grad(loss(lambda q, k, v: xla_masked_attention(q, k, v, mask, h)[0]),
                     argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(lambda q, k, v: prefix_flash_attention_sharded(
        q, k, v, valid_len, h, mesh, block=256, interpret=True)),
                     argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_prefix_flash_sharded_rejects_bad_divisibility(rng):
    from chadavit_tpu.ops.attention import prefix_flash_attention_sharded
    from chadavit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_model=2)
    q = jnp.zeros((8, 65, 96), jnp.float32)
    with pytest.raises(ValueError, match="heads"):
        prefix_flash_attention_sharded(q, q, q, jnp.ones((8,), jnp.int32),
                                       3, mesh, interpret=True)
