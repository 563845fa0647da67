"""Generate train/val/test CSV manifests from an image directory (reference
``src/data/generate_train_val_test_csv_files.py:8``).

Groups per-channel files into images by shared stem (everything before the
final ``_c{N}``/``-ch{N}`` suffix, or the whole stem for single-channel data),
then splits by ratio and writes ``{out}/train.csv`` / ``val.csv`` / ``test.csv``
rows ``image_id,[label,]"['ch1.png', ...]"``.

Usage:
    python tools/generate_splits.py IMAGES_DIR OUT_DIR [--val 0.1] [--test 0.2] \
        [--labeled]  # label = parent directory name index
"""

from __future__ import annotations

import argparse
import csv
import os
import random
import re
from collections import defaultdict

CHANNEL_RE = re.compile(r"^(?P<stem>.+?)[-_](?:c|ch|channel)?(?P<idx>\d+)$")
EXTS = {".png", ".jpg", ".jpeg", ".tif", ".tiff", ".npy"}


def group_channels(images_dir: str):
    groups = defaultdict(list)
    for root, _, files in os.walk(images_dir):
        for f in sorted(files):
            stem, ext = os.path.splitext(f)
            if ext.lower() not in EXTS:
                continue
            rel = os.path.relpath(os.path.join(root, f), images_dir)
            m = CHANNEL_RE.match(stem)
            key = os.path.join(os.path.dirname(rel), m.group("stem")) if m else os.path.splitext(rel)[0]
            groups[key].append(rel)
    return dict(groups)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("images_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--val", type=float, default=0.1)
    ap.add_argument("--test", type=float, default=0.2)
    ap.add_argument("--labeled", action="store_true",
                    help="derive an integer label from the parent directory")
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    groups = group_channels(args.images_dir)
    ids = sorted(groups)
    random.Random(args.seed).shuffle(ids)
    n = len(ids)
    n_test, n_val = int(n * args.test), int(n * args.val)
    splits = {
        "test": ids[:n_test],
        "val": ids[n_test : n_test + n_val],
        "train": ids[n_test + n_val :],
    }

    label_map = {}
    os.makedirs(args.out_dir, exist_ok=True)
    for split, split_ids in splits.items():
        with open(os.path.join(args.out_dir, f"{split}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            for image_id in split_ids:
                paths = groups[image_id]
                if args.labeled:
                    cls = os.path.dirname(image_id) or "_"
                    label = label_map.setdefault(cls, len(label_map))
                    w.writerow([image_id, label, str(paths)])
                else:
                    w.writerow([image_id, str(paths)])
        print(f"{split}: {len(split_ids)} images")
    if args.labeled:
        print("labels:", label_map)


if __name__ == "__main__":
    main()
