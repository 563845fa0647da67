"""Generate a cached low-data-regime file list from a train manifest (reference
``src/utils/generate_low_shot_file.py:18``): samples ``ratio`` of the train.csv
image ids and writes ``train_{DatasetClass}_{ratio}.txt`` next to it — the
cache that :class:`chadavit_tpu.data.datasets.CsvManifestDataset` loads.

Usage:
    python tools/generate_low_shot.py ROOT_DIR DatasetClassName 0.1 [--seed 5]
"""

from __future__ import annotations

import argparse
import csv
import os
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir")
    ap.add_argument("dataset_class")
    ap.add_argument("ratio", type=float)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()
    assert 0 < args.ratio <= 1

    with open(os.path.join(args.root_dir, "train.csv")) as f:
        ids = [row[0] for row in csv.reader(f) if row]
    keep = random.Random(args.seed).sample(ids, int(len(ids) * args.ratio))
    out = os.path.join(args.root_dir, f"train_{args.dataset_class}_{args.ratio}.txt")
    with open(out, "w") as f:
        f.writelines(i + "\n" for i in keep)
    print(f"wrote {len(keep)}/{len(ids)} ids to {out}")


if __name__ == "__main__":
    main()
