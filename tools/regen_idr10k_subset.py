"""Fast /tmp-wipe recovery for the 10k-scale study runs: rebuild ONLY what
``scripts/pretrain/dino_idr10k*.yaml`` and the kNN drive need from the 104k
synthetic dataset — manifests, the deterministic 10% sample-cache file, the
10% train subset images, and the full val split — instead of re-rendering all
104,093 images (~570k planes, >1h on a 1-core host; the subset is ~69k
planes, ~15 min).

Manifest rows (channel count, label, file names) are derivable WITHOUT
rendering: the generator (tools/generate_disk_dataset.py ``_make_one``) draws
them from ``default_rng(seed*1_000_003 + idx)`` before touching pixels, and
every image renders independently from that same per-index seed.

The 10% subset is defined HERE, canonically, as
``random.Random(5).sample(train_rows, int(0.1*len(train_rows)))`` written to
``{out}/train_BBBC048_0.1.txt`` — the cache file the manifest engine
(chadavit_tpu/data/datasets.py sample_ratio) reads before ever drawing, so
pretrain, the online-kNN bank, and the offline kNN drive all see the same
subset regardless of global RNG state.

Usage:
    python tools/regen_idr10k_subset.py [--out /tmp/chadavit_idr100k] [--full]

``--full`` renders every image (equivalent to the original
generate_disk_dataset.py invocation recorded in
chadavit_tpu/data/splits/idr100k_synth/README.md, resumable: valid files are
skipped).
"""

from __future__ import annotations

import argparse
import csv
import glob
import multiprocessing as mp
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from generate_disk_dataset import _make_one  # noqa: E402

N, MIN_C, MAX_C, CLASSES, SEED, IMG, DEPTH = 104093, 1, 10, 7, 0, 224, 8
VAL_FRACTION = 0.02
SAMPLE_RATIO = 0.1
SAMPLE_SEED = 5  # seed of the canonical runs (dino_idr10k*.yaml)


def manifest_rows():
    rows = []
    for i in range(N):
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        c = int(rng.integers(MIN_C, MAX_C + 1))
        label = int(rng.integers(0, CLASSES))
        rows.append((i, label, [f"img{i:06d}_c{ci}.png" for ci in range(c)]))
    return rows


def image_ok(out: str, names) -> bool:
    from PIL import Image

    for nm in names:
        p = os.path.join(out, nm)
        if not os.path.isfile(p) or os.path.getsize(p) == 0:
            return False
        try:
            with Image.open(p) as im:
                im.verify()  # catches planes truncated by a killed generator
        except Exception:
            return False
    return True


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/chadavit_idr100k")
    ap.add_argument("--full", action="store_true",
                    help="render ALL images, not just subset+val")
    ap.add_argument("--workers", type=int, default=6)
    args = ap.parse_args(argv)
    out = args.out
    os.makedirs(out, exist_ok=True)

    t0 = time.time()
    rows = manifest_rows()
    # consistency probe against any images already on disk
    for probe in (0, 1, 5000, 15000):
        on_disk = len(glob.glob(os.path.join(out, f"img{probe:06d}_c*.png")))
        if on_disk and on_disk != len(rows[probe][2]):
            raise SystemExit(f"manifest/disk mismatch at idx {probe}: "
                             f"disk={on_disk} derived={len(rows[probe][2])}")

    n_val = int(N * VAL_FRACTION)
    splits = {"train.csv": rows[: N - n_val], "test.csv": rows[N - n_val:]}
    for fname, rs in splits.items():
        with open(os.path.join(out, fname), "w", newline="") as f:
            wr = csv.writer(f)
            for idx, label, names in rs:
                wr.writerow([f"img{idx:06d}", label, repr(names)])

    train_rows = splits["train.csv"]
    k = int(len(train_rows) * SAMPLE_RATIO)
    sampled = random.Random(SAMPLE_SEED).sample(train_rows, k)
    with open(os.path.join(out, f"train_BBBC048_{SAMPLE_RATIO}.txt"), "w") as f:
        f.writelines(f"img{r[0]:06d}\n" for r in sampled)
    print(f"manifests + {k}-id sample cache written ({time.time()-t0:.1f}s)",
          flush=True)

    if args.full:
        need = list(range(N))
    else:
        need = sorted({r[0] for r in sampled} | {r[0] for r in splits["test.csv"]})
    todo = [i for i in need if not image_ok(out, rows[i][2])]
    print(f"{len(need)} images needed, {len(todo)} to render", flush=True)
    tasks = [(i, SEED * 1_000_003 + i, IMG, MIN_C, MAX_C, DEPTH, "png",
              CLASSES, out) for i in todo]
    t1 = time.time()
    with mp.Pool(args.workers) as pool:
        for j, _ in enumerate(pool.imap_unordered(_make_one, tasks, chunksize=16)):
            if j % 2000 == 0:
                print(f"rendered {j}/{len(todo)} ({time.time()-t1:.0f}s)", flush=True)
    planes = sum(len(rows[i][2]) for i in todo)
    dt = max(time.time() - t1, 1e-9)
    print(f"done: {len(todo)} imgs / {planes} planes in {dt:.1f}s "
          f"({planes/dt:.0f} planes/s)", flush=True)


if __name__ == "__main__":
    main()
