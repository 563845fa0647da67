"""Backbone registry (reference ``src/backbones/vit/__init__.py:29-59``).

``vit_channels`` maps to the channel-adaptive ChAdaViT; the plain names map to
timm-equivalent ViTs used by the ``one_channel`` / RGB strategies.
"""

from chadavit_tpu.models.chada_vit import (  # noqa: F401
    ChAdaViT,
    chada_vit,
    channel_padding_mask,
    densify_one_channel_batch,
)
from chadavit_tpu.models.dino_head import DINOHead  # noqa: F401
from chadavit_tpu.models.vit import (  # noqa: F401
    VisionTransformer,
    vit_base,
    vit_large,
    vit_small,
    vit_tiny,
    vit_ultra_tiny,
)

BACKBONES = {
    "vit_channels": chada_vit,
    "chada_vit": chada_vit,
    "vit_ultra_tiny": vit_ultra_tiny,
    "vit_tiny": vit_tiny,
    "vit_small": vit_small,
    "vit_base": vit_base,
    "vit_large": vit_large,
}


def get_backbone(name: str, **kwargs):
    if name not in BACKBONES:
        raise KeyError(f"unknown backbone {name!r}; available: {sorted(BACKBONES)}")
    return BACKBONES[name](**kwargs)
