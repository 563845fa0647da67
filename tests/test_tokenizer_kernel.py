"""Fused tokenizer kernel vs the model's XLA tokenization (interpret on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from chadavit_tpu.models import chada_vit
from chadavit_tpu.ops.tokenizer import fused_tokenize


def test_fused_tokenizer_matches_model(rng):
    model = chada_vit(patch_size=16, embed_dim=64, return_all_tokens=False,
                      max_number_channels=4, img_size=32, depth=1, num_heads=2,
                      seq_pad_multiple=0)
    x = rng.standard_normal((2, 4, 32, 32)).astype(np.float32)
    cc = np.asarray([2, 4], np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cc))
    p = variables["params"]

    emb, mask = model.apply(variables, jnp.asarray(x), jnp.asarray(cc),
                            method="tokenize")
    want = np.asarray(emb)[:, 1:]  # drop CLS: kernel embeds patch tokens only

    got = fused_tokenize(
        jnp.asarray(x),
        p["patch_embed"]["kernel"], p["patch_embed"]["bias"],
        jnp.asarray(p["pos_embed"])[0, 0, 1:],          # (N, D)
        jnp.asarray(p["channel_token"])[0, :, 0],        # (C, D)
        patch=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pallas_tokenizer_through_model(rng):
    """tokenizer_impl='pallas' produces the same CLS embeddings as the XLA path
    (init with the default impl, apply with the kernel — same params)."""
    from jax.experimental.pallas import tpu as pltpu

    from chadavit_tpu.models import chada_vit as make

    m_x = make(patch_size=16, embed_dim=64, return_all_tokens=False,
               max_number_channels=4, img_size=32, depth=1, num_heads=2)
    x = rng.standard_normal((2, 4, 32, 32)).astype(np.float32)
    cc = jnp.asarray([2, 4])
    v = m_x.init(jax.random.PRNGKey(0), jnp.asarray(x), cc)
    out_x = m_x.apply(v, jnp.asarray(x), cc)

    m_p = make(patch_size=16, embed_dim=64, return_all_tokens=False,
               max_number_channels=4, img_size=32, depth=1, num_heads=2,
               tokenizer_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out_p = m_p.apply(v, jnp.asarray(x), cc)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)


def test_fused_tokenizer_vjp_matches_xla_grads(rng):
    """Gradients through the fused tokenizer must equal autodiff through the
    equivalent XLA tokenization (the op is linear, so the VJP is exact)."""
    p2, d, n = 256, 64, 4  # patch 16, 32x32 image -> 4 patches
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    kernel = rng.standard_normal((p2, d)).astype(np.float32) * 0.05
    bias = rng.standard_normal((d,)).astype(np.float32) * 0.05
    pos = rng.standard_normal((n, d)).astype(np.float32) * 0.05
    chtok = rng.standard_normal((3, d)).astype(np.float32) * 0.05
    cot = rng.standard_normal((2, 3 * n, d)).astype(np.float32)

    def xla_ref(x, kernel, bias, pos, chtok):
        b, c, h, w = x.shape
        patches = x.reshape(b, c, 2, 16, 2, 16).transpose(0, 1, 2, 4, 3, 5)
        patches = patches.reshape(b, c, n, p2)
        tok = patches @ kernel + bias + pos[None, None] + chtok[None, :, None]
        return tok.reshape(b, c * n, d)

    def pallas_path(x, kernel, bias, pos, chtok):
        return fused_tokenize(x, kernel, bias, pos, chtok, patch=16, interpret=True)

    args = tuple(map(jnp.asarray, (x, kernel, bias, pos, chtok)))
    out_ref, vjp_ref = jax.vjp(xla_ref, *args)
    out_pal, vjp_pal = jax.vjp(pallas_path, *args)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=1e-4)
    for g_ref, g_pal, name in zip(vjp_ref(jnp.asarray(cot)), vjp_pal(jnp.asarray(cot)),
                                  ("x", "kernel", "bias", "pos", "chtok")):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_pallas_tokenizer_trains_through_model(rng):
    """End-to-end grad through a model with tokenizer_impl='pallas' matches the
    XLA tokenization path."""
    from jax.experimental.pallas import tpu as pltpu

    from chadavit_tpu.models import chada_vit as make

    kw = dict(patch_size=16, embed_dim=64, return_all_tokens=False,
              max_number_channels=4, img_size=32, depth=1, num_heads=2)
    m_x = make(**kw)
    m_p = make(**kw, tokenizer_impl="pallas")
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 32)).astype(np.float32))
    cc = jnp.asarray([2, 4])
    v = m_x.init(jax.random.PRNGKey(0), x, cc)

    def loss_x(params):
        return jnp.sum(m_x.apply({"params": params}, x, cc) ** 2)

    def loss_p(params):
        return jnp.sum(m_p.apply({"params": params}, x, cc) ** 2)

    g_x = jax.grad(loss_x)(v["params"])
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss_p)(v["params"])
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_p)}
    for k, leaf in flat_x:
        np.testing.assert_allclose(np.asarray(flat_p[jax.tree_util.keystr(k)]),
                                   np.asarray(leaf), rtol=2e-4, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(k))
