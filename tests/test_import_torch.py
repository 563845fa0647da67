"""Torch checkpoint file import: the encoder->backbone->strip remap contract
end-to-end from a .ckpt file (reference HOW_TO_USE cell-14 / main_linear.py:103-110)."""

import numpy as np
import pytest

import jax.numpy as jnp

from chadavit_tpu.models import chada_vit
from chadavit_tpu.models.import_torch import (
    import_backbone_checkpoint,
    load_torch_state_dict,
    remap_backbone_keys,
)

from .oracle import load_reference


def test_ckpt_file_roundtrip(tmp_path, rng):
    torch = pytest.importorskip("torch")
    ref = load_reference()
    torch.manual_seed(2)
    tmodel = ref.ChAdaViT(img_size=[64], patch_size=16, embed_dim=192, depth=12,
                          num_heads=2, return_all_tokens=False, max_number_channels=10)
    tmodel.eval()

    # save as a Lightning-style checkpoint with encoder.* keys (older runs used
    # `encoder`; the remap contract maps encoder->backbone->strip)
    sd = {("encoder." + k): v for k, v in tmodel.state_dict().items()}
    sd["classifier.weight"] = torch.zeros(7, 192)  # extra keys must be tolerated
    ckpt = tmp_path / "model.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, ckpt)

    params = import_backbone_checkpoint(str(ckpt), backbone="vit_channels", depth=12)
    jmodel = chada_vit(patch_size=16, embed_dim=192, return_all_tokens=False,
                       max_number_channels=10, img_size=64)

    x = rng.standard_normal((2, 10, 64, 64)).astype(np.float32)
    cc = np.asarray([3, 10], np.int32)
    out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(cc)))

    # reference forward on the ragged layout
    flat = np.concatenate([x[0, :3], x[1, :10]])[:, None]
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(flat), index=0, list_num_channels=[[3, 10]]).numpy()
    cos = np.sum(out * ref_out, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref_out, axis=-1))
    assert np.all(cos >= 1 - 1e-4)


def test_dino_head_import_matches_torch(rng):
    """DINOHead state-dict import (mlp Sequential indices + weight-norm
    prototype split) reproduces the reference head's outputs exactly
    (reference ``dino.py:32-111``; VERDICT r3 item #6: the head leg of the
    checkpoint-import contract is pinned, not just the backbone)."""
    torch = pytest.importorskip("torch")
    from chadavit_tpu.models.dino_head import DINOHead as JDINOHead
    from chadavit_tpu.models.import_torch import dino_head_params_from_torch

    from .oracle import load_reference_training_pieces

    ref = load_reference_training_pieces()
    torch.manual_seed(7)
    for use_bn, norm_last in ((False, True), (False, False)):
        thead = ref.DINOHead(in_dim=24, num_prototypes=48, use_bn=use_bn,
                             norm_last_layer=norm_last, hidden_dim=40,
                             bottleneck_dim=16)
        thead.eval()
        sd = {k: v.detach().numpy() for k, v in thead.state_dict().items()}
        params = dino_head_params_from_torch(sd)
        jhead = JDINOHead(in_dim=24, num_prototypes=48, use_bn=use_bn,
                          norm_last_layer=norm_last, hidden_dim=40,
                          bottleneck_dim=16)
        x = rng.standard_normal((6, 24)).astype(np.float32)
        got = np.asarray(jhead.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            want = thead(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_remap_tolerates_plain_backbone_prefix():
    sd = {"backbone.cls_token": np.zeros((1, 1, 8)), "head.mlp.0.weight": np.ones((4, 8))}
    out = remap_backbone_keys(sd)
    assert "cls_token" in out and "head.mlp.0.weight" not in out
