"""Attention-map export (reference ``main_attn.py``).

Loads one image, crops it to a patch-size multiple, runs
``get_last_selfattention`` (1-channel tokenization path, reference
``chada_vit.py:313-320``), and saves: the normalized input (``img.png``),
per-head CLS->patch attention maps plus their mean (nearest-upsampled by
patch_size), and — when ``threshold`` is set — per-head MASKED OVERLAYS of the
top-attention-mass patches on the input image with contours
(``mask_th{t}_head{j}.png``, reference ``main_attn.py:207-265`` +
``display_instances``)."""

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


def _threshold_mask(m: np.ndarray, threshold: float) -> np.ndarray:
    """Binary mask of the patches holding the top ``threshold`` attention mass
    (reference ``main_attn.py:210-226``: ascending sort, cumsum, keep the
    tail)."""
    flat = m.ravel()
    order = np.argsort(flat)
    val = flat[order] / max(flat.sum(), 1e-12)
    keep_sorted = np.cumsum(val) > (1.0 - threshold)
    keep = np.empty_like(keep_sorted)
    keep[order] = keep_sorted
    return keep.reshape(m.shape).astype(np.float32)


def _save_overlay(img01: np.ndarray, mask: np.ndarray, path: str,
                  color=(1.0, 0.35, 0.1), alpha: float = 0.5):
    """Input image with a semi-transparent colored mask + 1px contour
    (reference ``display_instances``, ``main_attn.py:50-90``)."""
    from PIL import Image

    rgb = np.repeat(img01[:, :, None], 3, axis=2)
    m = mask > 0.5
    for c in range(3):
        ch = rgb[:, :, c]
        ch[m] = ch[m] * (1 - alpha) + alpha * color[c]
    # contour: mask minus its erosion
    interior = np.zeros_like(m)
    interior[1:-1, 1:-1] = (m[1:-1, 1:-1] & m[:-2, 1:-1] & m[2:, 1:-1]
                            & m[1:-1, :-2] & m[1:-1, 2:])
    edge = m & ~interior
    for c in range(3):
        rgb[:, :, c][edge] = color[c]
    Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(path)


def main(argv=None):
    cfg = parse_attn_cfg(load_cfg(argv, description=__doc__))
    model, params = load_backbone_for_eval(cfg)
    patch = cfg.get("patch_size", 16)

    from PIL import Image

    img = np.asarray(Image.open(cfg.image_path), np.float32)
    if img.ndim == 3:
        img = img.mean(-1)  # single-channel attention path
    # reference resizes to cfg.image_size before the patch-multiple crop
    # (main_attn.py:182-189, A.Resize(image_size, image_size)); default 224
    size = int(cfg.get("image_size", 224) or 0)
    if size and img.shape != (size, size):
        import cv2

        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    h = img.shape[0] - img.shape[0] % patch
    w = img.shape[1] - img.shape[1] % patch
    img = img[:h, :w]
    x = jnp.asarray(img)[None, None]  # (1, 1, H, W)

    # both ChAdaViT and plain ViT expose the same get_last_selfattention method
    attn = model.apply({"params": params}, x, method="get_last_selfattention")
    attn = np.asarray(attn)  # (1, heads, S, S)
    nh = attn.shape[1]
    gh, gw = h // patch, w // patch
    cls_attn = attn[0, :, 0, 1:].reshape(nh, gh, gw)  # CLS -> patches

    out_dir = cfg.get("output_dir", "attn_maps")
    os.makedirs(out_dir, exist_ok=True)

    # normalized input image (reference saves make_grid(img, normalize=True))
    img01 = img - img.min()
    if img01.max() > 0:
        img01 = img01 / img01.max()
    from PIL import Image as _Image

    _Image.fromarray((img01 * 255).astype(np.uint8)).save(
        os.path.join(out_dir, "img.png"))

    # raw per-head maps + mean (the reference thresholds only the MASKS,
    # main_attn.py:232-249)
    threshold = cfg.get("threshold")
    maps = []
    for j in range(nh):
        up = np.kron(cls_attn[j], np.ones((patch, patch)))  # nearest upsample
        maps.append(up)
        _save_map(up, os.path.join(out_dir, f"attn-head{j}.png"))
    _save_map(np.mean(maps, axis=0), os.path.join(out_dir, "attn-mean.png"))

    if threshold:
        for j in range(nh):
            th = _threshold_mask(cls_attn[j], float(threshold))
            mask = np.kron(th, np.ones((patch, patch)))
            _save_overlay(img01, mask,
                          os.path.join(out_dir, f"mask_th{threshold}_head{j}.png"))
        print(f"saved {nh} head maps + mean + {nh} masked overlays to {out_dir}/")
    else:
        print(f"saved {nh} head maps + mean to {out_dir}/")


if __name__ == "__main__":
    main()
