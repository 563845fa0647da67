"""Native C++ loader: decode parity vs PIL, dense batch layout, throughput sanity."""

import os

import numpy as np
import pytest

from chadavit_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason=f"native loader unavailable: {native.build_error()}"
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    files = {}
    # 8-bit PNG
    a8 = (rng.random((30, 40)) * 255).astype(np.uint8)
    Image.fromarray(a8).save(d / "gray8.png")
    files["gray8.png"] = a8.astype(np.float32)
    # 16-bit PNG
    a16 = (rng.random((25, 35)) * 65535).astype(np.uint16)
    Image.fromarray(a16).save(d / "gray16.png")
    files["gray16.png"] = a16.astype(np.float32)
    # JPEG (lossy: compare loosely)
    aj = (rng.random((32, 32)) * 255).astype(np.uint8)
    Image.fromarray(aj).save(d / "gray.jpg", quality=95)
    files["gray.jpg"] = aj.astype(np.float32)
    return d, files


def test_decode_parity_png(image_dir):
    d, files = image_dir
    for name in ("gray8.png", "gray16.png"):
        got = native.decode_plane(str(d / name))
        np.testing.assert_array_equal(got, files[name])


def test_decode_jpeg_close(image_dir):
    d, files = image_dir
    got = native.decode_plane(str(d / "gray.jpg"))
    assert got.shape == files["gray.jpg"].shape
    # lossy codec: mean abs error small
    assert np.mean(np.abs(got - files["gray.jpg"])) < 3.0


def test_dense_batch_layout_and_resize(image_dir):
    d, _ = image_dir
    batch_paths = [
        [str(d / "gray8.png"), str(d / "gray16.png")],
        [str(d / "gray.jpg")],
    ]
    out, counts = native.load_dense_batch(batch_paths, max_channels=3,
                                          height=16, width=16, scale=1.0)
    assert out.shape == (2, 3, 16, 16)
    assert list(counts) == [2, 1]
    assert (out[0, 2] == 0).all() and (out[1, 1:] == 0).all()  # padding zeroed
    assert out[0, 0].std() > 0  # real content

    # resize correctness vs cv2 bilinear (same half-pixel convention)
    import cv2

    ref = cv2.resize(native.decode_plane(str(d / "gray8.png")), (16, 16),
                     interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out[0, 0], ref, rtol=1e-4, atol=1e-2)


def test_scale_applied(image_dir):
    d, _ = image_dir
    out, _ = native.load_dense_batch([[str(d / "gray8.png")]], 1, 30, 40, scale=1 / 255.0)
    assert out.max() <= 1.0


def test_native_eval_loader(tmp_path, image_dir):
    d, _ = image_dir

    class DS:
        task = "classification"
        file_list = [("a", 1, [str(d / "gray8.png")]),
                     ("b", 0, [str(d / "gray16.png"), str(d / "gray.jpg")]),
                     ("c", 2, [str(d / "gray.jpg")])]

    loader = native.NativeEvalLoader(DS(), batch_size=2, max_channels=2, height=8, width=8)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (2, 2, 8, 8)
    assert list(batches[0]["labels"]) == [1, 0]
    assert list(batches[1]["labels"]) == [2]


def test_prepare_data_native_path(tmp_path):
    """main_knn-style eval data through the C++ loader."""
    import csv as csvmod

    from PIL import Image

    from chadavit_tpu.data.classification import prepare_data

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng2 = np.random.default_rng(1)
    rows = []
    for i in range(6):
        paths = []
        for c in range(1 + i % 2):
            p = f"i{i}_c{c}.png"
            Image.fromarray((rng2.random((12, 12)) * 255).astype(np.uint8)).save(img_dir / p)
            paths.append(p)
        rows.append([f"id{i}", str(paths)])
    with open(tmp_path / "train.csv", "w", newline="") as f:
        csvmod.writer(f).writerows(rows)

    tl, vl = prepare_data("idrcell100k", train_path=str(tmp_path), val_path=None,
                          batch_size=3, max_channels=2, crop_size=8,
                          val_transform_for_train=True, native_loader=True)
    batches = list(tl)
    assert batches[0]["images"].shape == (3, 2, 8, 8)
    assert sum(len(b["labels"]) for b in batches) == 6
