"""Golden parity: JAX ChAdaViT vs the reference PyTorch implementation.

Mirrors HOW_TO_USE.ipynb cell-16/26: random images with 1-10 channels, mixed in
one batch; embeddings must match to >= 1 - 1e-4 cosine similarity (BASELINE.md
target), and we additionally check tight elementwise tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chadavit_tpu.models import chada_vit, densify_one_channel_batch
from chadavit_tpu.models.import_torch import chada_vit_params_from_torch

from .oracle import load_reference

IMG = 64  # 4x4 patch grid -> seq 1 + 10*16 = 161; fast on CPU yet exercises everything


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    ref = load_reference()
    torch.manual_seed(0)
    model = ref.ChAdaViT(
        img_size=[IMG], patch_size=16, embed_dim=192, depth=12, num_heads=2,
        return_all_tokens=False, max_number_channels=10,
    )
    model.eval()
    return torch, model


@pytest.fixture(scope="module")
def jax_model(torch_ref):
    torch, model = torch_ref
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = chada_vit_params_from_torch(sd, depth=12)
    jm = chada_vit(patch_size=16, embed_dim=192, return_all_tokens=False,
                   max_number_channels=10, img_size=IMG)
    return jm, {"params": params}


def _mixed_batch(rng, counts, img=IMG):
    flat = rng.standard_normal((sum(counts), 1, img, img)).astype(np.float32)
    return flat, list(counts)


def test_cls_embedding_parity(torch_ref, jax_model, rng):
    torch, tmodel = torch_ref
    jmodel, variables = jax_model
    counts = [3, 1, 10, 5]
    flat, lst = _mixed_batch(rng, counts)

    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(flat), index=0, list_num_channels=[lst]).numpy()

    dense, cc = densify_one_channel_batch(flat, lst, max_channels=10)
    out = jmodel.apply(variables, dense, cc)
    out = np.asarray(out)

    assert ref_out.shape == out.shape == (4, 192)
    cos = np.sum(ref_out * out, -1) / (
        np.linalg.norm(ref_out, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert np.all(cos >= 1 - 1e-4), f"cosine parity failed: {cos}"
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-4)


def test_all_tokens_parity(torch_ref, jax_model, rng):
    torch, tmodel = torch_ref
    jmodel, variables = jax_model
    counts = [2, 7]
    flat, lst = _mixed_batch(rng, counts)

    tmodel.return_all_tokens = True
    with torch.no_grad():
        ref_tokens = tmodel(torch.from_numpy(flat), index=0, list_num_channels=[lst]).numpy()
    tmodel.return_all_tokens = False

    dense, cc = densify_one_channel_batch(flat, lst, max_channels=10)
    tokens, valid = jmodel.apply(variables, dense, cc, return_dense_tokens=True)
    tokens, valid = np.asarray(tokens), np.asarray(valid)
    ragged = tokens[valid]  # flatten exactly like the reference (chada_vit.py:283-287)

    assert ragged.shape == ref_tokens.shape
    np.testing.assert_allclose(ragged, ref_tokens, rtol=1e-4, atol=2e-4)


def test_last_selfattention_parity(torch_ref, jax_model, rng):
    torch, tmodel = torch_ref
    jmodel, variables = jax_model
    x = rng.standard_normal((1, 1, IMG, IMG)).astype(np.float32)

    with torch.no_grad():
        ref_attn = tmodel.get_last_selfattention(torch.from_numpy(x)).numpy()

    attn = jmodel.apply(variables, jnp.asarray(x), method="get_last_selfattention")
    attn = np.asarray(attn)
    assert attn.shape == ref_attn.shape  # (1, heads, S, S)
    np.testing.assert_allclose(attn, ref_attn, rtol=1e-4, atol=2e-5)


def test_full_res_cls_parity(torch_ref, rng):
    """One full 224x224 check on a small batch (the HOW_TO_USE path)."""
    torch, _ = torch_ref
    ref_mod = load_reference()
    torch.manual_seed(1)
    tmodel = ref_mod.ChAdaViT(img_size=[224], patch_size=16, embed_dim=192, depth=12,
                              num_heads=2, return_all_tokens=False, max_number_channels=10)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = chada_vit_params_from_torch(sd, depth=12)
    jmodel = chada_vit(patch_size=16, embed_dim=192, return_all_tokens=False,
                       max_number_channels=10, img_size=224)

    counts = [4, 1]
    flat, lst = _mixed_batch(rng, counts, img=224)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(flat), index=0, list_num_channels=[lst]).numpy()
    dense, cc = densify_one_channel_batch(flat, lst, max_channels=10)
    out = np.asarray(jmodel.apply({"params": params}, dense, cc))

    cos = np.sum(ref_out * out, -1) / (
        np.linalg.norm(ref_out, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert np.all(cos >= 1 - 1e-4), f"cosine parity failed: {cos}"


def test_mask_semantics():
    from chadavit_tpu.models import channel_padding_mask

    m = np.asarray(channel_padding_mask(jnp.asarray([2, 10, 1]), 10, 16))
    assert m.shape == (3, 161)
    assert not m[:, 0].any()  # CLS never masked
    assert not m[0, 1 : 1 + 32].any() and m[0, 1 + 32 :].all()
    assert not m[1, 1:].any()
    assert not m[2, 1 : 1 + 16].any() and m[2, 1 + 16 :].all()


def test_bucketed_dense_width_equals_padded(torch_ref, jax_model, rng):
    """Forward on a dense (B, 3, H, W) batch (channel bucketing) must equal the
    forward on the same images padded to C_max=10 — the channel tokens for the
    first 3 slots are identical either way."""
    jmodel, variables = jax_model
    b = 3
    imgs = rng.standard_normal((b, 3, IMG, IMG)).astype(np.float32)
    counts = np.asarray([3, 2, 1], np.int32)
    for i, c in enumerate(counts):
        imgs[i, c:] = 0.0

    padded = np.zeros((b, 10, IMG, IMG), np.float32)
    padded[:, :3] = imgs

    out_bucket = np.asarray(jmodel.apply(variables, jnp.asarray(imgs), jnp.asarray(counts)))
    out_padded = np.asarray(jmodel.apply(variables, jnp.asarray(padded), jnp.asarray(counts)))
    np.testing.assert_allclose(out_bucket, out_padded, rtol=1e-5, atol=1e-5)


def test_intermediate_layers_parity(torch_ref, jax_model, rng):
    torch, tmodel = torch_ref
    jmodel, variables = jax_model
    counts = [2, 4]
    flat, lst = _mixed_batch(rng, counts)
    dense, cc = densify_one_channel_batch(flat, lst, max_channels=10)

    outs = jmodel.apply(variables, dense, cc, 2, method="get_intermediate_layers")
    assert len(outs) == 2

    # torch reference: run blocks manually (the reference's method has a
    # signature bug — tokenization without args, chada_vit.py:323 — so we
    # replicate its documented behavior: normed outputs of the last n blocks)
    with torch.no_grad():
        x, mask = tmodel.channel_aware_tokenization(torch.from_numpy(flat), 0, [lst])
        ref_outs = []
        for i, blk in enumerate(tmodel.blocks):
            x = blk(x, src_key_padding_mask=mask)
            if len(tmodel.blocks) - i <= 2:
                ref_outs.append(tmodel.norm(x).numpy())

    s_real = ref_outs[0].shape[1]
    for got, want in zip(outs, ref_outs):
        got = np.asarray(got)[:, :s_real]
        # compare only valid (non-padded) positions
        valid = ~np.asarray(mask.numpy())
        np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=2e-4)


def test_gradient_parity_vs_torch(torch_ref, jax_model, rng):
    """Backward-path numerics: gradients match torch autograd on identical
    weights/input — validates training, not just inference.

    The probe loss contracts ALL valid token outputs with a fixed random
    cotangent (a plain VJP, exactly what training does). Sum-of-squares probes
    are useless here: the squared norm of LayerNorm outputs is nearly invariant
    (||x_hat||^2 = D identically), so upstream gradients vanish to f32 noise in
    both frameworks."""
    torch, tmodel = torch_ref
    jmodel, variables = jax_model
    counts = [2, 5]
    flat, lst = _mixed_batch(rng, counts)
    n_tokens = sum(counts) * (IMG // 16) ** 2
    G = rng.standard_normal((n_tokens, 192)).astype(np.float32)

    # ---- torch grads (all valid tokens, random cotangent) ----
    tmodel.zero_grad()
    tmodel.return_all_tokens = True
    out = tmodel(torch.from_numpy(flat), index=0, list_num_channels=[lst])
    loss = (out * torch.from_numpy(G)).sum()
    loss.backward()
    tmodel.return_all_tokens = False
    t_grads = {k: v.grad.detach().numpy() for k, v in tmodel.named_parameters()
               if v.grad is not None}

    # ---- jax grads ----
    dense, cc = densify_one_channel_batch(flat, lst, max_channels=10)

    def loss_fn(params):
        tokens, valid = jmodel.apply({"params": params}, dense, cc,
                                     return_dense_tokens=True)
        # scatter G rows onto the valid positions (same ragged order as torch)
        idx = np.cumsum(np.asarray(valid).ravel()) - 1
        g_dense = jnp.asarray(
            np.where(np.asarray(valid).ravel()[:, None], G[np.clip(idx, 0, None)], 0.0)
        ).reshape(tokens.shape)
        return jnp.sum(tokens.astype(jnp.float32) * g_dense)

    g = jax.grad(loss_fn)(variables["params"])

    np.testing.assert_allclose(float(loss.item()), float(loss_fn(variables["params"])),
                               rtol=1e-4)

    # NOTE: LayerNorm scale/bias params that feed directly into another
    # LayerNorm (every blocks.*.norm*) are near-null directions — the next LN
    # renormalizes uniform scalings away, leaving f32 cancellation residue in
    # both frameworks (verified by finite differences) — so they are excluded.
    checks = [
        ("channel_token", np.asarray(g["channel_token"])),
        ("pos_embed", np.asarray(g["pos_embed"])),
        ("token_learner.proj.bias", np.asarray(g["patch_embed"]["bias"])),
        ("token_learner.proj.weight",
         np.asarray(g["patch_embed"]["kernel"]).T.reshape(192, 1, 16, 16)),
        ("blocks.0.self_attn.in_proj_weight",
         np.asarray(g["blocks_0"]["in_proj_kernel"]).T),
        ("blocks.5.linear1.weight", np.asarray(g["blocks_5"]["linear1"]["kernel"]).T),
        ("blocks.11.linear2.weight", np.asarray(g["blocks_11"]["linear2"]["kernel"]).T),
        ("norm.weight", np.asarray(g["norm"]["scale"])),
    ]
    verified = 0
    for name, got in checks:
        want = t_grads[name]
        if np.abs(want).max() < 1e-3:
            # gradient is f32 cancellation residue in both frameworks (e.g.
            # cls_token: excluded from the all-token loss, reached only through
            # attention-key paths) — digits are unverifiable noise
            continue
        atol = 1e-3 * np.abs(want).max()  # f32 accumulation noise on near-cancelling sums
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=atol,
                                   err_msg=f"grad mismatch: {name}")
        verified += 1
    assert verified >= 5, f"too few well-conditioned gradients verified: {verified}"
