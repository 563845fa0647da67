"""Generate an on-disk IDRCell100k-shaped microscopy dataset for pipeline
benchmarks and learning runs.

The reference trains from per-channel single-plane files listed in a CSV
manifest (reference ``custom_datasets.py:166-215``: each row holds an image id
and a python-list string of channel file paths; IDRCell100K keeps images under
``{root}/images``). This tool writes that exact layout with synthetic
microscopy-like content — per-channel gaussian blobs + band-limited texture +
shot noise — so PNG/TIFF files compress (and therefore decode) at realistic
rates, unlike white noise.

When ``--classes K`` is given, each image gets a class whose signature is a
fixed texture orientation/frequency shared by all its channels. The classes
are linearly separable in any reasonable embedding, which makes the dataset a
learning-dynamics probe (can DINO + kNN beat chance?) as well as a decode
benchmark; the manifest then uses the labeled layout (id, target, paths) of
the classification sets (reference ``custom_datasets.py:730+``).

Usage:
    python tools/generate_disk_dataset.py --out /tmp/disk_ds --n 8000 \
        --depth 8 --format png [--classes 8] [--val-fraction 0.1]
"""

from __future__ import annotations

import argparse
import csv
import multiprocessing as mp
import os
import time

import numpy as np


def _render_image(seed: int, img_size: int, n_channels: int, depth: int,
                  label: int, num_classes: int) -> np.ndarray:
    """(H, W, C) integer planes with blobs + oriented texture + noise
    (shared renderer: chadavit_tpu.data.synthetic)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from chadavit_tpu.data.synthetic import render_structured_image

    return render_structured_image(seed, img_size, n_channels, depth, label,
                                   num_classes)


def _write_plane(arr2d: np.ndarray, path: str):
    from PIL import Image

    # compress_level=1: PNG encode is the generator's bottleneck on few-core
    # hosts (11.3 -> 6.7 ms/plane at 224px for ~10% larger files); decode-side
    # realism is unaffected (same zlib stream format the loader's libdeflate
    # fast path walks)
    if arr2d.dtype == np.uint16:
        Image.fromarray(arr2d, mode="I;16").save(path, compress_level=1)
    else:
        Image.fromarray(arr2d, mode="L").save(path, compress_level=1)


def _make_one(task):
    (idx, seed, img_size, min_c, max_c, depth, fmt, num_classes, img_dir) = task
    rng = np.random.default_rng(seed)
    c = int(rng.integers(min_c, max_c + 1))
    label = int(rng.integers(0, num_classes)) if num_classes else -1
    img = _render_image(seed + 1, img_size, c, depth, max(label, 0), num_classes)
    ext = "tif" if fmt == "tiff" else "png"
    names = []
    for ci in range(c):
        name = f"img{idx:06d}_c{ci}.{ext}"
        _write_plane(img[:, :, ci], os.path.join(img_dir, name))
        names.append(name)
    return idx, label, names


def generate(out_dir: str, n: int, img_size: int = 224, min_channels: int = 1,
             max_channels: int = 10, depth: int = 8, fmt: str = "png",
             num_classes: int = 0, val_fraction: float = 0.0, seed: int = 0,
             workers: int = 8, image_subdir: str = "images") -> str:
    img_dir = os.path.join(out_dir, image_subdir) if image_subdir else out_dir
    os.makedirs(img_dir, exist_ok=True)
    tasks = [(i, seed * 1_000_003 + i, img_size, min_channels, max_channels,
              depth, fmt, num_classes, img_dir) for i in range(n)]
    t0 = time.time()
    with mp.Pool(workers) as pool:
        rows = pool.map(_make_one, tasks, chunksize=32)
    rows.sort()
    n_val = int(n * val_fraction)
    splits = {"train.csv": rows[: n - n_val]}
    if n_val:
        splits["test.csv"] = rows[n - n_val:]
    rel = (image_subdir + "/") if image_subdir else ""
    for fname, rs in splits.items():
        with open(os.path.join(out_dir, fname), "w", newline="") as f:
            wr = csv.writer(f)
            for idx, label, names in rs:
                paths = repr([rel + nm for nm in names]) if image_subdir == "" \
                    else repr(names)  # IDRCell100K joins root/images + name
                if num_classes:
                    wr.writerow([f"img{idx:06d}", label, paths])
                else:
                    wr.writerow([f"img{idx:06d}", paths])
    dt = time.time() - t0
    n_planes = sum(len(r[2]) for r in rows)
    print(f"wrote {n} images / {n_planes} planes to {out_dir} "
          f"in {dt:.1f}s ({n_planes / dt:.0f} planes/s)")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--min-channels", type=int, default=1)
    ap.add_argument("--max-channels", type=int, default=10)
    ap.add_argument("--depth", type=int, default=8, choices=(8, 16))
    ap.add_argument("--format", default="png", choices=("png", "tiff"))
    ap.add_argument("--classes", type=int, default=0,
                    help="0 = unlabeled pretrain manifest; K>0 = labeled")
    ap.add_argument("--val-fraction", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--flat", action="store_true",
                    help="images next to the manifest (classification layout) "
                         "instead of under images/ (IDRCell100K layout)")
    a = ap.parse_args()
    generate(a.out, a.n, a.img_size, a.min_channels, a.max_channels, a.depth,
             a.format, a.classes, a.val_fraction, a.seed, a.workers,
             image_subdir="" if a.flat else "images")


if __name__ == "__main__":
    main()
