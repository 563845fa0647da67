"""High-level embedding API — the ``HOW_TO_USE.ipynb`` contract as a module.

The reference notebook's flow (cells 13-26): build ``chadavit16-moyen``
(patch 16, embed 192, depth 12, heads 2, max 10 channels), load the torch
checkpoint with the ``encoder->backbone->strip`` remap, collate a ragged list
of (C_i, H, W) images into the one-channel layout, and extract (B, 192) CLS
embeddings with ``mixed_channels=True``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


CHADAVIT16_MOYEN_MD5 = "e8a24ac58b8e34bdce10e0024d507f2e"  # HOW_TO_USE cell-8/9


def load_chadavit16_moyen(checkpoint: Optional[str] = None, img_size: int = 224,
                          dtype=jnp.float32, verify_md5: bool = False):
    """Returns (model, variables) for the canonical checkpoint config
    (reference ``HOW_TO_USE.ipynb`` cell-13, ``chada_vit.py:333-339``).
    ``verify_md5=True`` checks the published checkpoint hash (cell-8/9)."""
    from chadavit_tpu.models import chada_vit
    from chadavit_tpu.models.import_torch import import_backbone_checkpoint

    model = chada_vit(patch_size=16, embed_dim=192, return_all_tokens=False,
                      max_number_channels=10, img_size=img_size, dtype=dtype)
    if checkpoint and verify_md5:
        import hashlib

        digest = hashlib.md5(open(checkpoint, "rb").read()).hexdigest()
        if digest != CHADAVIT16_MOYEN_MD5:
            raise ValueError(
                f"checkpoint md5 {digest} != published {CHADAVIT16_MOYEN_MD5}")
    if checkpoint:
        params = import_backbone_checkpoint(checkpoint, backbone="vit_channels", depth=12)
    else:
        x = jnp.zeros((1, 10, img_size, img_size), dtype)
        params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,), jnp.int32))["params"]
    return model, {"params": params}


def collate_images(images: Sequence[np.ndarray], max_channels: int = 10
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged list of (C_i, H, W) arrays -> dense (B, C_max, H, W) + counts
    (the notebook's ``collate_images``, cell-20, without the ragged detour)."""
    b = len(images)
    h, w = images[0].shape[-2:]
    dense = np.zeros((b, max_channels, h, w), np.float32)
    counts = np.empty((b,), np.int32)
    for i, img in enumerate(images):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = img[None]
        c = min(img.shape[0], max_channels)
        dense[i, :c] = img[:c]
        counts[i] = c
    return jnp.asarray(dense), jnp.asarray(counts)


def extract_embeddings(model, variables, images: Sequence[np.ndarray],
                       batch_size: int = 64, max_channels: int = 10) -> np.ndarray:
    """(B, 192) CLS embeddings for a ragged list of multi-channel images
    (the notebook's reference embedding path, cells 24-26)."""
    fwd = jax.jit(lambda x, cc: model.apply(variables, x, cc))
    out = []
    for s in range(0, len(images), batch_size):
        chunk = list(images[s : s + batch_size])
        pad = 0
        if len(chunk) < batch_size and s > 0:  # keep one compiled shape
            pad = batch_size - len(chunk)
            chunk += [chunk[-1]] * pad
        x, cc = collate_images(chunk, max_channels)
        emb = np.asarray(fwd(x, cc))
        out.append(emb[: len(emb) - pad])
    return np.concatenate(out)
