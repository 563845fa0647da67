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
