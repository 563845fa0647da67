"""Feature extraction with the reference's channel-strategy semantics.

The reference regroups backbone outputs per strategy (reference
``src/methods/base.py:508-559``, ``linear.py:400-427``):

- ``multi_channels`` (ChAdaViT) + ``return_all_tokens=False`` -> CLS ``(B, D)``;
- ``multi_channels`` + ``return_all_tokens=True`` with a fixed per-dataset
  channel count ``c`` -> all real tokens flattened ``(B, c*N*D)``;
- ``one_channel`` (plain ViT applied per channel plane) -> per-channel CLS
  embeddings concatenated ``(B, c*D)``;
- RGB / fixed-channel ViT -> CLS ``(B, D)``.

``mixed_channels`` batches (ragged counts) only support the CLS mode — the
reference disables regrouping there (``base.py:537``, SURVEY §2.4 #11).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def features_dim(strategy: Optional[str], embed_dim: int, num_patches: int,
                 img_channels: int, return_all_tokens: bool) -> int:
    """Feature dimensionality per strategy (reference ``base.py:209-230``)."""
    if strategy == "multi_channels":
        return img_channels * num_patches * embed_dim if return_all_tokens else embed_dim
    if strategy == "one_channel":
        return img_channels * num_patches * embed_dim if return_all_tokens else img_channels * embed_dim
    return embed_dim


def make_feature_fn(
    model,
    strategy: Optional[str],
    return_all_tokens: bool = False,
    mixed_channels: bool = False,
    img_channels: int = 1,
) -> Callable:
    """Build ``fn(params, images, channel_counts) -> (B, F)`` features.

    ``images`` is dense ``(B, C_max, H, W)``; for fixed-channel datasets
    ``C_max == img_channels`` and all counts equal."""
    num_patches = getattr(model, "num_patches", None)

    def multi_channels(params, images, channel_counts):
        if return_all_tokens and not mixed_channels:
            tokens, valid = model.apply({"params": params}, images, channel_counts,
                                        return_dense_tokens=True)
            b = tokens.shape[0]
            # fixed channel count: the first img_channels*N tokens are real
            n_real = img_channels * num_patches
            return tokens[:, :n_real].reshape(b, -1)
        return model.apply({"params": params}, images, channel_counts)

    def one_channel(params, images, channel_counts):
        b, c, h, w = images.shape
        planes = images.reshape(b * c, 1, h, w)
        feats = model.apply({"params": params}, planes)  # (B*c, D) CLS
        return feats.reshape(b, -1)  # (B, c*D)

    def plain(params, images, channel_counts):
        return model.apply({"params": params}, images)

    if strategy == "multi_channels":
        return multi_channels
    if strategy == "one_channel":
        return one_channel
    return plain


def extract_features(
    loader,
    feature_fn: Callable,
    params,
    jit: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the feature fn over a loader (reference ``base.py:901-981`` /
    ``main_knn.py:44-70``). Returns numpy ``(features, targets)``."""
    from chadavit_tpu.data.pipeline import device_prefetch

    fn = jax.jit(feature_fn) if jit else feature_fn
    feats, targets = [], []

    def _upload(batch):
        return (jnp.asarray(batch["images"]),
                jnp.asarray(batch["channel_counts"]), batch["labels"])

    # uploads run in a side thread and the device->host fetch is deferred one
    # batch (np.asarray blocks on the result; keeping one extraction in flight
    # overlaps batch N+1's upload+compute with fetching batch N)
    pending = None
    for images, counts, labels in device_prefetch(iter(loader), _upload, depth=2):
        out = fn(params, images, counts)
        if pending is not None:
            feats.append(np.asarray(pending))
        pending = out
        targets.append(np.asarray(labels))
    if pending is not None:
        feats.append(np.asarray(pending))
    return np.concatenate(feats), np.concatenate(targets)
