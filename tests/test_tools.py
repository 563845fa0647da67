"""Data tooling: split/low-shot generators (reference
``generate_train_val_test_csv_files.py`` / ``generate_low_shot_file.py``) —
their outputs must round-trip through the manifest engine."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _run(tool, *args):
    return subprocess.run([sys.executable, os.path.join(TOOLS, tool), *args],
                          capture_output=True, text=True, check=True)


def test_generate_splits_roundtrip(tmp_path):
    """Channel grouping by shared stem + ratio split; labeled mode derives the
    label from the parent directory; outputs load via the manifest engine."""
    from PIL import Image

    for cls in ("a", "b"):
        d = tmp_path / "imgs" / cls
        d.mkdir(parents=True)
        for i in range(10):
            for c in range(2):
                Image.fromarray(np.zeros((4, 4), np.uint8)).save(
                    d / f"im{i}_c{c}.png")
    out = tmp_path / "out"
    _run("generate_splits.py", str(tmp_path / "imgs"), str(out),
         "--val", "0.2", "--test", "0.2", "--labeled")

    counts = {}
    for split in ("train", "val", "test"):
        with open(out / f"{split}.csv") as f:
            rows = [r for r in csv.reader(f) if r]
        counts[split] = len(rows)
        assert all(len(eval(r[2])) == 2 for r in rows)  # both channels grouped
    assert counts == {"train": 12, "val": 4, "test": 4}

    from chadavit_tpu.data.datasets import prepare_datasets

    (out / "train.csv").rename(out / "train_.csv")
    (out / "test.csv").rename(out / "_t.csv")
    (out / "val.csv").rename(out / "test.csv")
    (out / "train_.csv").rename(out / "train.csv")
    ds = prepare_datasets("bbbc048", train_path=str(out), train=True)
    assert len(ds) == 12 and {int(r[1]) for r in ds.file_list} <= {0, 1}


def test_generate_low_shot_cache_is_loaded(tmp_path):
    """The generated train_{Class}_{ratio}.txt is exactly the cache file the
    manifest engine's sample_ratio path loads."""
    from PIL import Image

    for i in range(10):
        Image.fromarray(np.zeros((4, 4), np.uint8)).save(tmp_path / f"im{i}_c0.png")
    with open(tmp_path / "train.csv", "w", newline="") as f:
        csv.writer(f).writerows(
            [[f"id{i}", i % 3, str([f"im{i}_c0.png"])] for i in range(10)])
    with open(tmp_path / "test.csv", "w") as f:
        f.write("")

    from chadavit_tpu.data.datasets import prepare_datasets

    probe = prepare_datasets("bbbc048", train_path=str(tmp_path), train=True)
    cls_name = type(probe).__name__
    r = _run("generate_low_shot.py", str(tmp_path), cls_name, "0.3")
    assert "wrote 3/10 ids" in r.stdout
    with open(tmp_path / f"train_{cls_name}_0.3.txt") as f:
        ids = {line.strip() for line in f if line.strip()}

    ds = prepare_datasets("bbbc048", train_path=str(tmp_path), train=True,
                          sample_ratio=0.3)
    assert {row[0] for row in ds.file_list} == ids
