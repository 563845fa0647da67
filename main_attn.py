"""Attention-map export (reference ``main_attn.py``).

Loads one image, crops it to a patch-size multiple, runs
``get_last_selfattention`` (1-channel tokenization path, reference
``chada_vit.py:313-320``), and saves per-head CLS->patch attention maps plus
their mean, nearest-upsampled by patch_size (reference ``main_attn.py:202-265``)."""

import os

import numpy as np

import jax.numpy as jnp

from chadavit_tpu.cli import load_backbone_for_eval, load_cfg
from chadavit_tpu.config import parse_attn_cfg


def _save_map(arr: np.ndarray, path: str):
    a = arr - arr.min()
    if a.max() > 0:
        a = a / a.max()
    img = (a * 255).astype(np.uint8)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img, cmap="inferno")
    except Exception:
        from PIL import Image

        Image.fromarray(img).save(path)


def main(argv=None):
    cfg = parse_attn_cfg(load_cfg(argv, description=__doc__))
    model, params = load_backbone_for_eval(cfg)
    patch = cfg.get("patch_size", 16)

    from PIL import Image

    img = np.asarray(Image.open(cfg.image_path), np.float32)
    if img.ndim == 3:
        img = img.mean(-1)  # single-channel attention path
    h = img.shape[0] - img.shape[0] % patch
    w = img.shape[1] - img.shape[1] % patch
    img = img[:h, :w]
    x = jnp.asarray(img)[None, None]  # (1, 1, H, W)

    if cfg.backbone.name in ("vit_channels", "chada_vit"):
        attn = model.apply({"params": params}, x, method="get_last_selfattention")
    else:
        attn = model.apply({"params": params}, x, method="get_last_selfattention")
    attn = np.asarray(attn)  # (1, heads, S, S)
    nh = attn.shape[1]
    gh, gw = h // patch, w // patch
    cls_attn = attn[0, :, 0, 1:].reshape(nh, gh, gw)  # CLS -> patches

    out_dir = cfg.get("output_dir", "attn_maps")
    os.makedirs(out_dir, exist_ok=True)

    threshold = cfg.get("threshold")
    maps = []
    for j in range(nh):
        m = cls_attn[j]
        if threshold:  # keep top attention mass (reference main_attn.py:219-236)
            flat = np.sort(m.ravel())[::-1]
            cum = np.cumsum(flat) / flat.sum()
            cut = flat[min(np.searchsorted(cum, threshold), flat.size - 1)]
            m = np.where(m >= cut, m, 0.0)
        up = np.kron(m, np.ones((patch, patch)))  # nearest-neighbor upsample
        maps.append(up)
        _save_map(up, os.path.join(out_dir, f"attn-head{j}.png"))
    _save_map(np.mean(maps, axis=0), os.path.join(out_dir, "attn-mean.png"))
    print(f"saved {nh} head maps + mean to {out_dir}/")


if __name__ == "__main__":
    main()
