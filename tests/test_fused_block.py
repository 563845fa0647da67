"""Parity of the fused encoder-block kernel (ops/fused_block.py) against the
unfused EncoderLayer (flax + XLA attention): forward outputs and every
gradient (x + all 12 parameters), on mixed valid lengths including
fully-skipped query blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes of tracing on CPU

from chadavit_tpu.models.chada_vit import EncoderLayer, channel_padding_mask
from chadavit_tpu.ops.fused_block import fused_encoder_block

B, S, D, H, F = 3, 200, 32, 2, 64
BLOCK = 64
EPS = 1e-5


def _build():
    rng = np.random.default_rng(0)
    layer = EncoderLayer(embed_dim=D, num_heads=H, ffn_dim=F,
                         layer_norm_eps=EPS, attn_impl="xla", ln_impl="xla")
    x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    vl = jnp.asarray([200, 60, 130], jnp.int32)  # incl. <BLOCK (skipped blocks)
    mask = jnp.arange(S)[None, :] >= vl[:, None]
    params = layer.init(jax.random.PRNGKey(0), x, mask, valid_len=vl)["params"]
    # non-trivial LN params so their gradients are informative
    params["norm1"]["scale"] = params["norm1"]["scale"] * 1.3 + 0.1
    params["norm2"]["bias"] = params["norm2"]["bias"] + 0.05
    return layer, params, x, vl, mask


def _flat(params):
    return (params["in_proj_kernel"], params["in_proj_bias"],
            params["out_proj_kernel"], params["out_proj_bias"],
            params["norm1"]["scale"], params["norm1"]["bias"],
            params["norm2"]["scale"], params["norm2"]["bias"],
            params["linear1"]["kernel"], params["linear1"]["bias"],
            params["linear2"]["kernel"], params["linear2"]["bias"])


def _fused(x, vl, params):
    return fused_encoder_block(x, vl, *_flat(params), H, EPS, EPS, BLOCK, True)


def test_forward_parity():
    layer, params, x, vl, mask = _build()
    ref = layer.apply({"params": params}, x, mask, valid_len=vl)
    out = _fused(x, vl, params)
    valid = ~np.asarray(mask)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(out)[i][valid[i]],
                                   np.asarray(ref)[i][valid[i]],
                                   rtol=2e-5, atol=2e-5)


def test_grad_parity():
    layer, params, x, vl, mask = _build()
    w = jnp.where(mask[:, :, None], 0.0, 1.0)  # valid-only loss => dy=0 on pads

    def loss_ref(x, params):
        y = layer.apply({"params": params}, x, mask, valid_len=vl)
        return jnp.sum((y * w) ** 2)

    def loss_fused(x, params):
        y = _fused(x, vl, params)
        return jnp.sum((y * w) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, params)

    l_ref = loss_ref(x, params)
    l_fus = loss_fused(x, params)
    np.testing.assert_allclose(np.asarray(l_fus), np.asarray(l_ref), rtol=1e-5)

    np.testing.assert_allclose(np.asarray(g_fus[0]), np.asarray(g_ref[0]),
                               rtol=2e-4, atol=2e-4, err_msg="dx")
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref[1])
    flat_fus = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_fus[1])}
    for k, v_ref in flat_ref:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(flat_fus[key]),
                                   np.asarray(v_ref),
                                   rtol=5e-4, atol=5e-4, err_msg=key)


def test_model_level_parity():
    """Full ChAdaViT with block_impl='fused' (interpreted) matches the unfused
    model: CLS forward and gradients through a scalar loss."""
    from chadavit_tpu.models.chada_vit import ChAdaViT

    kw = dict(img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
              ffn_dim=64, max_channels=3, return_all_tokens=False,
              seq_pad_multiple=64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    counts = jnp.asarray([1, 3], jnp.int32)

    ref_model = ChAdaViT(block_impl="xla", attn_impl="xla", **kw)
    params = ref_model.init(jax.random.PRNGKey(0), x, counts)["params"]
    fus_model = ChAdaViT(block_impl="fused", attn_impl="xla", **kw)

    y_ref = ref_model.apply({"params": params}, x, counts)
    y_fus = fus_model.apply({"params": params}, x, counts)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               rtol=3e-5, atol=3e-5)

    def loss(model):
        def f(params, x):
            return jnp.sum(model.apply({"params": params}, x, counts) ** 2)
        return f

    g_ref = jax.grad(loss(ref_model), argnums=(0, 1))(params, x)
    g_fus = jax.grad(loss(fus_model), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               rtol=1e-3, atol=1e-4, err_msg="dx")
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref[0])
    fus_leaves = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(g_fus[0])}
    for k, v_ref in ref_leaves:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(fus_leaves[key]),
                                   np.asarray(v_ref),
                                   rtol=1e-3, atol=1e-4, err_msg=key)


def test_bf16_runs_finite():
    layer, params, x, vl, mask = _build()
    p16 = params  # params stay f32; activations bf16 like training
    out = fused_encoder_block(x.astype(jnp.bfloat16), vl, *_flat(p16),
                              H, EPS, EPS, BLOCK, True)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_grad_parity_with_partial_tail_cotangent():
    """Rows beyond valid_len inside a PARTIALLY-valid block still compute a
    real (masked-softmax) forward, so a loss that includes them must produce
    the same gradients as the unfused layer; rows in FULLY-invalid blocks are
    zero-filled by convention and are excluded."""
    layer, params, x, vl, mask = _build()
    # include everything up to each row's block-rounded valid length
    vl_np = np.asarray(vl)
    upto = ((vl_np + BLOCK - 1) // BLOCK) * BLOCK
    w = (np.arange(S)[None, :] < upto[:, None]).astype(np.float32)[:, :, None]
    w = jnp.asarray(w)
    tgt = jnp.asarray(np.random.default_rng(7).standard_normal((B, S, D)),
                      jnp.float32)

    def loss_ref(x, params):
        y = layer.apply({"params": params}, x, mask, valid_len=vl)
        return jnp.sum((w * (y.astype(jnp.float32) - tgt)) ** 2)

    def loss_fused(x, params):
        y = _fused(x, vl, params)
        return jnp.sum((w * (y.astype(jnp.float32) - tgt)) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(g_fus[0]), np.asarray(g_ref[0]),
                               rtol=5e-4, atol=5e-4, err_msg="dx")
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref[1])
    fus_leaves = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(g_fus[1])}
    for k, v_ref in ref_leaves:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(fus_leaves[key]),
                                   np.asarray(v_ref),
                                   rtol=1e-3, atol=1e-3, err_msg=key)


def test_vmem_gate_rejects_large_models():
    """The fused-path gate must reject the ViT-Base-shaped layer (whose
    backward scratch exceeds the VMEM budget) and accept the canonical one,
    with the backward's doubled key block included in the estimate."""
    from chadavit_tpu.ops.fused_block import (
        DEFAULT_BLOCK, VMEM_BYTES, _bwd_block, vmem_estimate)

    assert _bwd_block(256, 2048) == 512   # doubles when it divides
    assert _bwd_block(256, 1792) == 256   # 1792 % 512 != 0
    # canonical chadavit16-moyen fits; ChAdaViT-B/16 must not
    assert vmem_estimate(2048, 192, 2048, 2, DEFAULT_BLOCK, 2) <= VMEM_BYTES
    assert vmem_estimate(2048, 768, 2048, 12, DEFAULT_BLOCK, 2) > VMEM_BYTES


def test_fused_block128_parity():
    """block=128 (the odd-128-multiple path, e.g. w=3 -> s_pad 640): forward +
    gradients match the unfused layer."""
    rng = np.random.default_rng(4)
    s, d, h, f = 640, 32, 2, 64
    layer = EncoderLayer(embed_dim=d, num_heads=h, ffn_dim=f,
                         layer_norm_eps=EPS, attn_impl="xla", ln_impl="xla")
    x = jnp.asarray(rng.standard_normal((2, s, d)), jnp.float32)
    vl = jnp.asarray([589, 197], jnp.int32)  # real 3-ch / 1-ch token counts
    mask = jnp.arange(s)[None, :] >= vl[:, None]
    params = layer.init(jax.random.PRNGKey(0), x, mask, valid_len=vl)["params"]

    ref = layer.apply({"params": params}, x, mask, valid_len=vl)
    out = fused_encoder_block(x, vl, *_flat(params), h, EPS, EPS, 128, True)
    valid = ~np.asarray(mask)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(out)[i][valid[i]],
                                   np.asarray(ref)[i][valid[i]],
                                   rtol=2e-5, atol=2e-5)

    w = jnp.where(mask[:, :, None], 0.0, 1.0)

    def loss_ref(params, x):
        return jnp.sum((layer.apply({"params": params}, x, mask, valid_len=vl) * w) ** 2)

    def loss_fus(params, x):
        return jnp.sum((fused_encoder_block(
            x, vl, *_flat(params), h, EPS, EPS, 128, True) * w) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_fus = jax.grad(loss_fus, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               rtol=1e-3, atol=1e-4, err_msg="dx")
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref[0])
    fus_leaves = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(g_fus[0])}
    for k, v_ref in ref_leaves:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(fus_leaves[key]),
                                   np.asarray(v_ref),
                                   rtol=1e-3, atol=1e-4, err_msg=key)


def test_fused_layer_sharded_over_dp_mesh_matches_unfused():
    """EncoderLayer with shard_mesh set runs the fused kernel under shard_map
    over the data axis (the multi-device DP path: GSPMD cannot partition a
    pallas_call — chada_vit.py wires this; VERDICT r3 item #5 follow-through)
    and matches the unfused XLA layer. B=8 shards over data=8."""
    from chadavit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_model=1)  # {data: 8}
    rng = np.random.default_rng(1)
    b = 8
    x = jnp.asarray(rng.standard_normal((b, S, D)), jnp.float32)
    vl = jnp.asarray([200, 60, 130, 64, 200, 1, 130, 190], jnp.int32)
    mask = jnp.arange(S)[None, :] >= vl[:, None]

    ref_layer = EncoderLayer(embed_dim=D, num_heads=H, ffn_dim=F,
                             layer_norm_eps=EPS, attn_impl="xla",
                             ln_impl="xla", block_impl="xla")
    params = ref_layer.init(jax.random.PRNGKey(0), x, mask, valid_len=vl)["params"]
    ref = ref_layer.apply({"params": params}, x, mask, valid_len=vl)

    # block_impl="fused" forces the kernel on CPU (interpret mode); with
    # shard_mesh it must take the shard_map branch
    sh_layer = EncoderLayer(embed_dim=D, num_heads=H, ffn_dim=F,
                            layer_norm_eps=EPS, attn_impl="xla",
                            ln_impl="xla", block_impl="fused", shard_mesh=mesh)
    out = sh_layer.apply({"params": params}, x, mask, valid_len=vl)

    valid = ~np.asarray(mask)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(out)[i][valid[i]],
                                   np.asarray(ref)[i][valid[i]],
                                   rtol=2e-5, atol=2e-5)
