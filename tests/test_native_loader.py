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


@pytest.fixture(scope="module")
def tiff_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("tiffs")
    rng = np.random.default_rng(1)
    files = {}
    a16 = (rng.random((28, 36)) * 65535).astype(np.uint16)
    Image.fromarray(a16).save(d / "gray16.tif")
    files["gray16.tif"] = a16
    a8 = (rng.random((20, 24)) * 255).astype(np.uint8)
    Image.fromarray(a8).save(d / "gray8.tif")
    files["gray8.tif"] = a8
    return d, files


def test_decode_tiff_16bit_parity(tiff_dir):
    """Native 16-bit TIFF decode matches the raw pixels (the reference decodes
    TIFF via tifffile/cv2 in the hot path, misc.py:465-478)."""
    d, files = tiff_dir
    for name, want in files.items():
        got = native.decode_plane(str(d / name))
        np.testing.assert_array_equal(got, want.astype(np.float32))


def test_decode_plane_raw_dtypes(tiff_dir, image_dir):
    d, files = tiff_dir
    got16 = native.decode_plane_raw(str(d / "gray16.tif"))
    assert got16.dtype == np.uint16
    np.testing.assert_array_equal(got16, files["gray16.tif"])
    got8 = native.decode_plane_raw(str(d / "gray8.tif"))
    assert got8.dtype == np.uint8
    np.testing.assert_array_equal(got8, files["gray8.tif"])
    d2, files2 = image_dir
    gotp = native.decode_plane_raw(str(d2 / "gray8.png"))
    assert gotp.dtype == np.uint8
    np.testing.assert_array_equal(gotp, files2["gray8.png"].astype(np.uint8))


def test_dense_batch_eval_modes(tiff_dir):
    """resize_mode 1/2 reproduce Resize->CenterCrop vs a numpy reference, and
    normalize maps 16-bit planes into [0,1]."""
    d, files = tiff_dir
    paths = [[str(d / "gray16.tif")]]

    def np_resize(img, th, tw, vh, vw, oy, ox):
        sy, sx = img.shape[0] / vh, img.shape[1] / vw
        out = np.empty((th, tw), np.float32)
        for y in range(th):
            fy = (y + oy + 0.5) * sy - 0.5
            y0 = int(np.floor(fy)); wy = fy - y0
            y1 = min(y0 + 1, img.shape[0] - 1); y0 = max(y0, 0)
            for x in range(tw):
                fx = (x + ox + 0.5) * sx - 0.5
                x0 = int(np.floor(fx)); wx = fx - x0
                x1 = min(x0 + 1, img.shape[1] - 1); x0 = max(x0, 0)
                out[y, x] = ((img[y0, x0] * (1 - wx) + img[y0, x1] * wx) * (1 - wy)
                             + (img[y1, x0] * (1 - wx) + img[y1, x1] * wx) * wy)
        return out

    src = files["gray16.tif"].astype(np.float32)
    # mode 1: square resize to 24 then center crop 16
    out, counts = native.load_dense_batch(paths, 1, 16, 16, resize_mode=1,
                                          resize_size=24, normalize=True)
    want = np_resize(src, 16, 16, 24, 24, 4, 4) / 65535.0
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-4, atol=1e-5)
    assert counts[0] == 1
    assert out.max() <= 1.0

    # mode 2: shorter side (28) -> 24 keeps aspect: virtual (24, 31)
    out2, _ = native.load_dense_batch(paths, 1, 16, 16, resize_mode=2,
                                      resize_size=24, normalize=True)
    vw = int(round(36 * 24 / 28))
    want2 = np_resize(src, 16, 16, 24, vw, (24 - 16) // 2, (vw - 16) // 2) / 65535.0
    np.testing.assert_allclose(out2[0, 0], want2, rtol=1e-4, atol=1e-5)


def test_imread_tiff_and_unit_scale(tiff_dir):
    """The python decode path returns [0,1] floats for any bit depth, and raw
    mode keeps native integers."""
    from chadavit_tpu.data.datasets import load_channel_stack

    d, files = tiff_dir
    paths = [str(d / "gray16.tif"), str(d / "gray8.tif")]
    # different sizes -> stack per-plane: use same-size planes only
    img = load_channel_stack([paths[0]])
    assert img.dtype == np.float32 and img.max() <= 1.0
    np.testing.assert_allclose(img[:, :, 0], files["gray16.tif"] / 65535.0, rtol=1e-6)
    raw = load_channel_stack([paths[0]], raw=True)
    assert raw.dtype == np.uint16
    np.testing.assert_array_equal(raw[:, :, 0], files["gray16.tif"])


def test_load_dense_batch_raw(image_dir, tiff_dir):
    """Raw dense batch: native-size memcpy planes, depth rescale, resize path,
    padding zeroed."""
    d, files = image_dir
    dt, tfiles = tiff_dir
    paths = [
        [str(d / "gray8.png")],                       # 30x40 u8 -> resize
        [str(dt / "gray16.tif"), str(d / "gray8.png")],  # mixed depths
    ]
    out, counts = native.load_dense_batch_raw(paths, 3, 16, 16, out_depth=8)
    assert out.dtype == np.uint8 and out.shape == (2, 3, 16, 16)
    assert list(counts) == [1, 2]
    assert (out[0, 1:] == 0).all() and (out[1, 2] == 0).all()
    # resize parity vs the float batch path (same bilinear kernel)
    f32, _ = native.load_dense_batch([paths[0]], 1, 16, 16)
    np.testing.assert_allclose(out[0, 0].astype(np.float32), f32[0, 0],
                               atol=0.51)  # rounding to u8

    # u16 output: native-size u16 plane is exact; u8 source scales by 257
    a16 = tfiles["gray16.tif"]
    out16, _ = native.load_dense_batch_raw([[str(dt / "gray16.tif")]], 1,
                                           a16.shape[0], a16.shape[1],
                                           out_depth=16)
    assert out16.dtype == np.uint16
    np.testing.assert_array_equal(out16[0, 0], a16)
    a8 = files["gray8.png"].astype(np.uint16)
    out8as16, _ = native.load_dense_batch_raw([[str(d / "gray8.png")]], 1,
                                              30, 40, out_depth=16)
    np.testing.assert_array_equal(out8as16[0, 0], a8 * 257)


def test_native_batch_fn_in_hostloader(image_dir):
    """HostLoader with a native_batch_fn bypasses per-sample decode and honors
    channel bucketing widths."""
    from chadavit_tpu.data.pipeline import HostLoader

    d, _ = image_dir
    rows = [("a", -1, [str(d / "gray8.png")]),
            ("b", -1, [str(d / "gray8.png"), str(d / "gray8.png")])] * 3

    class DS:
        file_list = rows

        def __len__(self):
            return len(rows)

        def channel_count(self, i):
            return len(rows[i][2])

        def __getitem__(self, i):  # must NOT be called on the native path
            raise AssertionError("per-sample path used")

    def batch_fn(idxs, width):
        images, counts = native.load_dense_batch_raw(
            [rows[int(i)][2] for i in idxs], width, 8, 8, out_depth=8)
        return {"images": images, "channel_counts": counts,
                "labels": np.full(len(idxs), -1, np.int32)}

    loader = HostLoader(DS(), batch_size=2, max_channels=4, shuffle=False,
                        drop_last=False, bucket_by_channels=True, bucket_round=1,
                        native_batch_fn=batch_fn)
    batches = list(loader)
    assert len(batches) == 3
    widths = sorted(b["images"].shape[1] for b in batches)
    assert widths == [1, 2, 2]  # exact-width buckets: 1-ch batch, two 2-ch
    assert all(b["images"].dtype == np.uint8 for b in batches)


def test_make_dense_batch_fn(image_dir):
    """The shared batch-fn factory (train loop + bench.py): classification ints,
    None targets -> -1 sentinel, regression floats."""
    d, _ = image_dir
    p = str(d / "gray8.png")

    class DS:
        file_list = [("a", 3, [p]), ("b", None, [p, p]), ("c", "1.5", [p])]

    fn = native.make_dense_batch_fn(DS(), 8, num_threads=1)
    b = fn([0, 1], 2)
    assert b["images"].shape == (2, 2, 8, 8) and b["images"].dtype == np.uint8
    assert b["labels"].dtype == np.int32
    assert b["labels"].tolist() == [3, -1]
    assert b["channel_counts"].tolist() == [1, 2]

    fn_reg = native.make_dense_batch_fn(DS(), 8, num_threads=1, regression=True)
    br = fn_reg([2], 1)
    assert br["labels"].dtype == np.float32
    assert abs(float(br["labels"][0]) - 1.5) < 1e-6


def test_decoded_plane_cache(image_dir, monkeypatch):
    """Second epoch through make_dense_batch_fn(cache=...) is decode-free and
    bit-identical; the byte cap stops insertions but never corrupts results."""
    d, _ = image_dir
    p = str(d / "gray8.png")

    class DS:
        file_list = [("a", 0, [p]), ("b", 1, [p, p])]

    calls = []
    real = native.load_dense_batch_raw

    def counting(paths, *a, **k):
        calls.append(len(paths))
        return real(paths, *a, **k)

    monkeypatch.setattr(native, "load_dense_batch_raw", counting)
    cache = native.DecodedPlaneCache()
    fn = native.make_dense_batch_fn(DS(), 8, num_threads=1, cache=cache)
    b1 = fn([0, 1], 2)
    assert calls == [2]  # both rows decoded once
    b2 = fn([0, 1], 2)
    assert calls == [2]  # second epoch: no decode
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["channel_counts"], b2["channel_counts"])
    assert cache.bytes == 8 * 8  # one unique path cached, uint8

    # zero-byte cap: nothing cached, every call decodes, results still right
    fn0 = native.make_dense_batch_fn(
        DS(), 8, num_threads=1, cache=native.DecodedPlaneCache(max_bytes=0))
    calls.clear()
    c1 = fn0([0, 1], 2)
    c2 = fn0([0, 1], 2)
    assert calls == [2, 2]
    np.testing.assert_array_equal(c1["images"], b1["images"])


def test_decoded_plane_cache_overflow(tmp_path, monkeypatch):
    """Dataset EXCEEDS ``cache_decoded`` byte cap (VERDICT r3 item #3): the
    insert-once store fills to the cap, later planes stay uncached, and from
    epoch 2 on only the overflow rows re-decode — partial caching degrades
    gracefully with bit-identical batches, never wrong results."""
    from PIL import Image

    rng = np.random.default_rng(3)
    paths, planes = [], []
    for i in range(6):
        a = (rng.random((16, 16)) * 255).astype(np.uint8)
        p = str(tmp_path / f"p{i}.png")
        Image.fromarray(a).save(p)
        paths.append(p)
        planes.append(a)

    class DS:  # one single-plane image per file; cap holds exactly the first 4
        file_list = [(f"im{i}", i, [paths[i]]) for i in range(6)]

    calls = []
    real = native.load_dense_batch_raw

    def counting(batch_paths, *a, **k):
        calls.append(len(batch_paths))
        return real(batch_paths, *a, **k)

    monkeypatch.setattr(native, "load_dense_batch_raw", counting)
    cache = native.DecodedPlaneCache(max_bytes=4 * 16 * 16)
    fn = native.make_dense_batch_fn(DS(), 16, num_threads=1, cache=cache)

    e1 = fn(list(range(6)), 1)  # epoch 1: everything decodes, cache fills to cap
    assert calls == [6]
    assert cache.bytes == 4 * 16 * 16 and len(cache.store) == 4

    e2 = fn(list(range(6)), 1)  # epoch 2: only the 2 overflow rows re-decode
    assert calls == [6, 2]
    assert cache.bytes == 4 * 16 * 16  # cap held; no eviction, no growth
    np.testing.assert_array_equal(e1["images"], e2["images"])
    for i in range(6):  # and every row is the true decode
        np.testing.assert_array_equal(e2["images"][i, 0], planes[i])


def _write_png(path, img: np.ndarray, filters, idat_split=1):
    """Hand-assemble a grayscale PNG with an EXPLICIT filter type per row —
    exercises every unfilter branch of the libdeflate fast path in
    native/chadaloader.cpp (PIL's adaptive encoder picks filters we can't
    control). ``filters`` is one PNG filter id (0-4) per row; ``idat_split``
    splits the zlib stream across that many IDAT chunks (the join path)."""
    import struct
    import zlib

    h, w = img.shape
    bpp = img.dtype.itemsize
    be = img.astype(">u2") if bpp == 2 else img  # PNG stores 16-bit big-endian
    rows = be.view(np.uint8).reshape(h, w * bpp).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(w * bpp, np.int16)
    for y, ft in enumerate(filters):
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - ((left + prev) // 2)
        else:  # Paeth
            pa = np.abs(prev - upleft)
            pb = np.abs(left - upleft)
            pc = np.abs(left + prev - 2 * upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        raw.append(ft)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8 * bpp, 0, 0, 0, 0)
    z = zlib.compress(bytes(raw), 6)
    step = max(1, len(z) // idat_split)
    idats = b"".join(chunk(b"IDAT", z[i:i + step]) for i in range(0, len(z), step))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + idats + chunk(b"IEND", b""))


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_png_fast_path_all_filters(tmp_path, dtype):
    rng = np.random.default_rng(7)
    img = rng.integers(0, np.iinfo(dtype).max + 1, (11, 23), dtype=dtype)
    # one file per filter type, plus a mixed-filter + split-IDAT file
    for ft in range(5):
        p = tmp_path / f"f{ft}.png"
        _write_png(p, img, [ft] * img.shape[0])
        got = native.decode_plane_raw(str(p))
        assert got.dtype == dtype and np.array_equal(got, img), f"filter {ft}"
    p = tmp_path / "mixed.png"
    _write_png(p, img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0, 4], idat_split=3)
    got = native.decode_plane_raw(str(p))
    assert np.array_equal(got, img)


def test_png_corrupt_inputs_fail_cleanly(tmp_path):
    """Truncated/bit-flipped PNGs must raise, never crash or return garbage
    silently (the fast path falls back to libpng, which also rejects)."""
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (31, 37), dtype=np.uint8)
    src = tmp_path / "ok.png"
    Image.fromarray(img).save(src)
    data = src.read_bytes()
    cases = [data[:k] for k in range(8, len(data), 97)]
    for _ in range(60):
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for i, c in enumerate(cases):
        p = tmp_path / f"f{i}.png"
        p.write_bytes(c)
        try:
            got = native.decode_plane_raw(str(p))
            # rare survivor (e.g. a flip confined to CRC bytes): must still
            # be a sane array, not garbage dimensions
            assert got.ndim == 2 and 0 < got.size <= img.size * 4
        except RuntimeError:
            pass  # clean decode error is the expected outcome
