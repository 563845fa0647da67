"""PyTorch checkpoint -> JAX parameter importer.

Implements the reference's state-dict remap contract (SURVEY §2.4 #15;
reference ``HOW_TO_USE.ipynb`` cell-14, ``main_linear.py:103-110``,
``main_knn.py:181-196``): rename ``encoder*`` -> ``backbone*``, strip the
``backbone.`` prefix, tolerate missing/extra keys — plus the layout conversions:

- torch ``MultiheadAttention`` packed ``in_proj_weight (3D, D)`` -> flax
  ``in_proj_kernel (D, 3D)`` (transpose; q/k/v stay packed).
- ``Conv2d`` patch embeds (stride == kernel) -> flattened matmul kernels.
- ``nn.Linear`` weights transposed to flax ``(in, out)`` kernels.
- DINOHead ``weight_norm`` ``weight_v (P, bottleneck)`` / ``weight_g (P, 1)``
  -> ``last_layer_v (bottleneck, P)`` / ``last_layer_g (P,)``.

No torch import is required unless loading a ``.ckpt``/``.pt`` file directly —
mappings of numpy arrays are accepted.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file and return a flat numpy state dict.

    Accepts Lightning checkpoints (``{"state_dict": ...}``) and plain state dicts.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: _np(v) for k, v in sd.items()}


def remap_backbone_keys(sd: Mapping[str, Any], prefix: str = "backbone.") -> Dict[str, np.ndarray]:
    """Apply the ``encoder -> backbone -> strip`` remap contract."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        k = k.replace("encoder", "backbone") if k.startswith("encoder") else k
        if k.startswith(prefix):
            out[k[len(prefix):]] = _np(v)
    if not out:  # checkpoint was already a bare backbone state dict
        out = {k: _np(v) for k, v in sd.items()}
    return out


def chada_vit_params_from_torch(sd: Mapping[str, Any], depth: int = 12) -> Dict[str, Any]:
    """Convert a bare ChAdaViT torch state dict (reference
    ``src/backbones/vit/chada_vit.py``) into flax params for
    :class:`chadavit_tpu.models.ChAdaViT`."""
    sd = {k: _np(v) for k, v in sd.items()}
    d = sd["cls_token"].shape[-1]
    proj_w = sd["token_learner.proj.weight"]  # (D, 1, p, p)
    params: Dict[str, Any] = {
        "cls_token": sd["cls_token"],
        "channel_token": sd["channel_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {
            "kernel": proj_w.reshape(d, -1).T.copy(),
            "bias": sd["token_learner.proj.bias"],
        },
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"blocks_{i}"] = {
            "in_proj_kernel": sd[p + "self_attn.in_proj_weight"].T.copy(),
            "in_proj_bias": sd[p + "self_attn.in_proj_bias"],
            "out_proj_kernel": sd[p + "self_attn.out_proj.weight"].T.copy(),
            "out_proj_bias": sd[p + "self_attn.out_proj.bias"],
            "linear1": {"kernel": sd[p + "linear1.weight"].T.copy(), "bias": sd[p + "linear1.bias"]},
            "linear2": {"kernel": sd[p + "linear2.weight"].T.copy(), "bias": sd[p + "linear2.bias"]},
            "norm1": {"scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]},
            "norm2": {"scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]},
        }
    return params


def vit_params_from_torch(sd: Mapping[str, Any], depth: int = 12, in_chans: int = 1) -> Dict[str, Any]:
    """Convert a timm ``VisionTransformer`` torch state dict into flax params for
    :class:`chadavit_tpu.models.VisionTransformer`, duplicating RGB patch-embed
    weights to ``in_chans`` when needed (reference
    ``channels_strategies.py:145-154``)."""
    sd = {k: _np(v) for k, v in sd.items()}
    d = sd["cls_token"].shape[-1]
    proj_w = sd["patch_embed.proj.weight"]  # (D, C0, p, p)
    c0 = proj_w.shape[1]
    if c0 != in_chans:
        reps = -(-in_chans // c0)
        proj_w = np.tile(proj_w, (1, reps + 1, 1, 1))[:, :in_chans]
    params: Dict[str, Any] = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_kernel": proj_w.reshape(d, -1).T.copy(),
        "patch_bias": sd["patch_embed.proj.bias"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"blocks_{i}"] = {
            "qkv": {"kernel": sd[p + "attn.qkv.weight"].T.copy(), "bias": sd[p + "attn.qkv.bias"]},
            "proj": {"kernel": sd[p + "attn.proj.weight"].T.copy(), "bias": sd[p + "attn.proj.bias"]},
            "fc1": {"kernel": sd[p + "mlp.fc1.weight"].T.copy(), "bias": sd[p + "mlp.fc1.bias"]},
            "fc2": {"kernel": sd[p + "mlp.fc2.weight"].T.copy(), "bias": sd[p + "mlp.fc2.bias"]},
            "norm1": {"scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]},
            "norm2": {"scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]},
        }
    return params


def dino_head_params_from_torch(sd: Mapping[str, Any], num_layers: int = 3) -> Dict[str, Any]:
    """Convert a reference ``DINOHead`` torch state dict (``dino.py:32-111``;
    ``nn.Sequential`` mlp indices 0/2/4... with GELU interleaved, no BN) into
    flax params for :class:`chadavit_tpu.models.DINOHead`."""
    sd = {k: _np(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    if "mlp.weight" in sd:  # num_layers == 1: a bare nn.Linear
        params["mlp_0"] = {"kernel": sd["mlp.weight"].T.copy(), "bias": sd["mlp.bias"]}
    else:
        seq_idx = [k.split(".")[1] for k in sd if k.startswith("mlp.") and k.endswith(".weight")]
        linear_ids = sorted({int(i) for i in seq_idx})
        for j, li in enumerate(linear_ids):
            params[f"mlp_{j}"] = {
                "kernel": sd[f"mlp.{li}.weight"].T.copy(),
                "bias": sd[f"mlp.{li}.bias"],
            }
    # torch >=2 parametrized weight_norm uses parametrizations.* keys
    if "last_layer.weight_v" in sd:
        wv, wg = sd["last_layer.weight_v"], sd["last_layer.weight_g"]
    else:
        wv = sd["last_layer.parametrizations.weight.original1"]
        wg = sd["last_layer.parametrizations.weight.original0"]
    params["last_layer_v"] = wv.T.copy()  # (bottleneck, P)
    params["last_layer_g"] = wg.reshape(-1)
    return params


def import_backbone_checkpoint(path: str, backbone: str = "vit_channels", depth: int = 12,
                               in_chans: int = 1) -> Dict[str, Any]:
    """One-call import: load a Lightning/bare checkpoint, apply the remap
    contract, and convert to flax params for the named backbone."""
    sd = remap_backbone_keys(load_torch_state_dict(path))
    if backbone in ("vit_channels", "chada_vit"):
        return chada_vit_params_from_torch(sd, depth=depth)
    return vit_params_from_torch(sd, depth=depth, in_chans=in_chans)
