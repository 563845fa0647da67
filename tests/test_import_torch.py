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


def test_remap_tolerates_plain_backbone_prefix():
    sd = {"backbone.cls_token": np.zeros((1, 1, 8)), "head.mlp.0.weight": np.ones((4, 8))}
    out = remap_backbone_keys(sd)
    assert "cls_token" in out and "head.mlp.0.weight" not in out
