"""Data pipeline: transforms, dense collation, threaded loader."""

import numpy as np
import pytest

from chadavit_tpu.data import (
    AugmentationPipeline,
    FullTransformPipeline,
    HostLoader,
    NCropAugmentation,
    SyntheticChannels,
    dense_collate,
    one_channel_flatten,
    prepare_datasets,
)

AUG_CFG = {
    "crop_size": 32,
    "rrc": {"enabled": True, "crop_min_scale": 0.3, "crop_max_scale": 1.0},
    "color_jitter": {"prob": 0.8},
    "grayscale": {"prob": 0.2},
    "gaussian_blur": {"prob": 0.5},
    "solarization": {"prob": 0.2},
    "horizontal_flip": {"prob": 0.5},
}


def test_pipeline_channel_agnostic(rng):
    pipe = AugmentationPipeline(AUG_CFG, seed=0)
    for c in (1, 3, 7, 10):
        img = rng.random((48, 56, c)).astype(np.float32)
        out = pipe(img)
        assert out.shape == (c, 32, 32)
        assert out.dtype == np.float32


def test_multicrop_pipeline(rng):
    big = AugmentationPipeline(AUG_CFG, seed=1)
    small_cfg = dict(AUG_CFG, crop_size=16)
    small = AugmentationPipeline(small_cfg, seed=2)
    full = FullTransformPipeline([NCropAugmentation(big, 2), NCropAugmentation(small, 4)])
    img = rng.random((40, 40, 4)).astype(np.float32)
    crops = full(img)
    assert len(crops) == 6
    assert crops[0].shape == (4, 32, 32)
    assert crops[2].shape == (4, 16, 16)


def test_dense_collate_single():
    samples = [
        (np.ones((3, 8, 8), np.float32), 1),
        (np.ones((5, 8, 8), np.float32) * 2, 0),
    ]
    batch = dense_collate(samples, max_channels=6)
    assert batch["images"].shape == (2, 6, 8, 8)
    assert list(batch["channel_counts"]) == [3, 5]
    assert (batch["images"][0, 3:] == 0).all()  # padded planes zero
    assert (batch["images"][1, :5] == 2).all()
    assert list(batch["labels"]) == [1, 0]


def test_dense_collate_multicrop():
    def sample(c):
        return ([np.ones((c, 8, 8), np.float32)] * 2 + [np.ones((c, 4, 4), np.float32)] * 3, 0)

    batch = dense_collate([sample(2), sample(4)], max_channels=4)
    assert batch["crops"].shape == (2, 2, 4, 8, 8)
    assert batch["small_crops"].shape == (3, 2, 4, 4, 4)
    assert list(batch["channel_counts"]) == [2, 4]


def test_one_channel_flatten_roundtrip():
    images = np.arange(2 * 3 * 2 * 2, dtype=np.float32).reshape(2, 3, 2, 2)
    counts = np.asarray([2, 3])
    flat = one_channel_flatten(images, counts)
    assert flat.shape == (5, 1, 2, 2)
    np.testing.assert_array_equal(flat[0, 0], images[0, 0])
    np.testing.assert_array_equal(flat[2, 0], images[1, 0])


def test_host_loader_deterministic_order():
    ds = SyntheticChannels(n=40, img_size=8, max_channels=4)  # raw HWC samples
    ld1 = HostLoader(ds, batch_size=8, max_channels=4, num_workers=3, seed=7, channels_last=True)
    ld2 = HostLoader(ds, batch_size=8, max_channels=4, num_workers=1, seed=7, channels_last=True)
    b1 = [b["labels"] for b in ld1]
    b2 = [b["labels"] for b in ld2]
    assert len(b1) == len(b2) == 5
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)


def test_csv_manifest_dataset(tmp_path):
    import csv as csvmod

    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rows = []
    for i in range(4):
        paths = []
        for c in range(1 + i % 3):
            p = f"img{i}_c{c}.png"
            Image.fromarray((np.ones((8, 8)) * (10 * i + c)).astype(np.uint8)).save(img_dir / p)
            paths.append(p)
        rows.append([f"id{i}", str(paths)])
    with open(tmp_path / "train.csv", "w", newline="") as f:
        csvmod.writer(f).writerows(rows)

    ds = prepare_datasets("idrcell100k", train_path=str(tmp_path), train=True)
    assert len(ds) == 4
    img, label = ds[2]
    assert img.shape == (8, 8, 3)  # HWC with 3 channels
    assert label == -1  # unlabeled pretrain set
    assert img[0, 0, 1] == 21.0


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                arr = (np.ones((8, 8, 3)) * (i + 1)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

    ds = prepare_datasets("imagenet100", train_path=str(tmp_path), train=True)
    assert len(ds) == 6
    img, label = ds[0]
    assert img.shape[-1] == 3 and label in (0, 1)
    assert ds.int_to_labels == {0: "cat", 1: "dog"}


def test_bucketed_loader_groups_by_channels():
    ds = SyntheticChannels(n=64, img_size=8, min_channels=1, max_channels=8)
    ld = HostLoader(ds, batch_size=8, max_channels=8, num_workers=2, seed=3,
                    channels_last=True, bucket_by_channels=True)
    widths, seen = [], []
    for batch in ld:
        widths.append(batch["images"].shape[1])
        seen.extend(batch["channel_counts"].tolist())
        assert batch["images"].shape[1] >= batch["channel_counts"].max()
    # all 64 samples covered once; several distinct (smaller) widths appear
    assert len(seen) == 64
    assert min(widths) < 8
    # counts within each batch are tight: every batch's max width is a rounded
    # version of its own max count
    for batch in HostLoader(ds, batch_size=8, max_channels=8, num_workers=1, seed=3,
                            channels_last=True, bucket_by_channels=True):
        cmax = int(batch["channel_counts"].max())
        assert batch["images"].shape[1] == min(((cmax + 1) // 2) * 2, 8)


@pytest.mark.parametrize("name", [
    "idrcell100k", "idrcell100k_3channels", "bray", "bbbc021xbray", "bloodmnist",
    "bbbc021", "bbbc048", "cyclops", "tissuemnist", "mtbenchreg", "transloc",
])
def test_dataset_zoo_manifest_roundtrip(tmp_path, name):
    """Every manifest dataset constructs from its CSV layout and yields
    (HWC float32, target) with the right target type."""
    import csv as csvmod

    from PIL import Image

    from chadavit_tpu.data.datasets import DATASETS

    cls = DATASETS[name]
    root = tmp_path / name
    img_dir = root / ("images" if name.startswith("idrcell100k") else ".")
    img_dir.mkdir(parents=True, exist_ok=True)
    rng2 = np.random.default_rng(3)
    rows = []
    for i in range(3):
        paths = []
        for c in range(2):
            p = f"{name}_{i}_c{c}.png"
            Image.fromarray((rng2.random((6, 6)) * 255).astype(np.uint8)).save(img_dir / p)
            paths.append(p)
        if cls.labeled:
            target = "0.5" if cls.task == "regression" else "1"
            rows.append([f"id{i}", target, str(paths)])
        else:
            rows.append([f"id{i}", str(paths)])
    with open(root / "train.csv", "w", newline="") as f:
        csvmod.writer(f).writerows(rows)

    ds = cls(root_dir=str(root), train=True)
    assert len(ds) == 3
    assert ds.channel_count(0) == 2
    img, target = ds[0]
    expected_c = 2 if name != "idrcell100k_3channels" else 2  # <=3 channels kept
    assert img.shape == (6, 6, expected_c) and img.dtype == np.float32
    if cls.task == "regression":
        assert isinstance(target, float) and target == 0.5
    elif cls.labeled:
        assert isinstance(target, int) and target == 1
    else:
        assert target == -1


def test_random_channel_discard():
    from chadavit_tpu.data.transforms import RandomChannelDiscard

    local = np.random.default_rng(0)
    op = RandomChannelDiscard(max_discard=2, p=1.0)
    img = local.random((8, 8, 5)).astype(np.float32)
    out = op(img, local)
    assert out.shape[-1] in (3, 4)
    # single-channel images are never emptied
    one = local.random((8, 8, 1)).astype(np.float32)
    np.testing.assert_array_equal(op(one, local), one)
