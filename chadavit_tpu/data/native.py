"""ctypes binding for the native C++ loader (``native/chadaloader.cpp``) —
the TPU-native replacement for the reference's DALI GPU pipeline / PIL decode
path (reference ``src/data/dali_dataloader.py``, ``custom_datasets.py:166-190``).

Builds the shared library on first use with g++ (cached next to the source);
falls back gracefully (``is_available() -> False``) when the toolchain or
codec libraries are missing, in which case callers use the PIL path."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "chadaloader.cpp")
_SO = os.path.join(_REPO, "native", "libchadaloader.so")

_lib = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-lpng", "-ljpeg", "-ltiff", "-lz", "-ldeflate", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.chada_decode_plane.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.chada_decode_plane.restype = ctypes.c_int
        lib.chada_load_dense_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_float,
        ]
        lib.chada_load_dense_batch.restype = ctypes.c_int
        lib.chada_load_dense_batch_v2.argtypes = \
            lib.chada_load_dense_batch.argtypes + [ctypes.c_int, ctypes.c_int,
                                                   ctypes.c_int]
        lib.chada_load_dense_batch_v2.restype = ctypes.c_int
        lib.chada_decode_plane_raw.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.chada_decode_plane_raw.restype = ctypes.c_int
        lib.chada_load_dense_batch_raw.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.chada_load_dense_batch_raw.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_plane(path: str, max_pixels: int = 64 * 1024 * 1024) -> np.ndarray:
    """Decode one single-channel image file at native resolution (float32 HW)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    buf = np.empty(max_pixels, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.chada_decode_plane(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise RuntimeError(f"decode failed ({rc}): {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


def decode_plane_raw(path: str, max_pixels: int = 64 * 1024 * 1024) -> np.ndarray:
    """Decode one plane keeping the source integer dtype (uint8 or uint16 HW) —
    the raw-transfer path: ship 1-2 bytes/pixel, normalize on device."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    buf = np.empty(max_pixels * 2, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    d = ctypes.c_int()
    rc = lib.chada_decode_plane_raw(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, ctypes.byref(w), ctypes.byref(h), ctypes.byref(d),
    )
    if rc != 0:
        raise RuntimeError(f"raw decode failed ({rc}): {path}")
    n = w.value * h.value
    if d.value == 16:
        return buf[: n * 2].view(np.uint16).reshape(h.value, w.value).copy()
    return buf[:n].reshape(h.value, w.value).copy()


def load_dense_batch(
    channel_paths: Sequence[Sequence[str]],
    max_channels: int,
    height: int,
    width: int,
    num_threads: int = 8,
    scale: float = 1.0,
    resize_mode: int = 0,
    resize_size: int = 0,
    normalize: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize a batch of multi-channel images straight into the dense
    ``(B, C_max, H, W)`` float32 layout. Returns (batch, channel_counts).

    ``resize_mode``: 0 square resize to (H, W); 1 square resize to
    ``resize_size`` then center crop; 2 shorter-side resize to ``resize_size``
    then center crop (the reference eval protocols). ``normalize`` divides by
    the source dtype max (255 / 65535) so values land in [0, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    b = len(channel_paths)
    flat: List[bytes] = []
    offsets = np.zeros(b + 1, np.int64)
    for i, paths in enumerate(channel_paths):
        flat.extend(p.encode() for p in paths)
        offsets[i + 1] = len(flat)

    c_paths = (ctypes.c_char_p * len(flat))(*flat)
    out = np.zeros((b, max_channels, height, width), np.float32)
    counts = np.zeros(b, np.int32)
    failures = lib.chada_load_dense_batch_v2(
        c_paths,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        b, max_channels, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads, scale, int(resize_mode), int(resize_size), int(normalize),
    )
    if failures:
        raise RuntimeError(f"{failures} plane(s) failed to decode")
    return out, counts


def load_dense_batch_raw(
    channel_paths: Sequence[Sequence[str]],
    max_channels: int,
    height: int,
    width: int,
    num_threads: int = 4,
    out_depth: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a batch straight into the dense RAW integer ``(B, C_max, H, W)``
    layout (uint8 when ``out_depth=8``, uint16 when 16) — the production
    pretrain transfer path: 1-2 bytes/pixel to the device, normalization and
    augmentation on device (reference DALI pipeline role,
    ``dali_dataloader.py:453-591``). Size-matching planes are straight decoder
    memcpys (no float round-trip); mismatches bilinear-resize; 8<->16-bit
    sources rescale to ``out_depth``. Returns (batch, channel_counts)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    b = len(channel_paths)
    flat: List[bytes] = []
    offsets = np.zeros(b + 1, np.int64)
    for i, paths in enumerate(channel_paths):
        flat.extend(p.encode() for p in paths)
        offsets[i + 1] = len(flat)
    c_paths = (ctypes.c_char_p * len(flat))(*flat)
    dtype = np.uint16 if out_depth == 16 else np.uint8
    out = np.zeros((b, max_channels, height, width), dtype)
    counts = np.zeros(b, np.int32)
    failures = lib.chada_load_dense_batch_raw(
        c_paths,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        b, max_channels, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads, int(out_depth),
    )
    if failures:
        raise RuntimeError(f"{failures} plane(s) failed to decode")
    return out, counts


class DecodedPlaneCache:
    """In-memory cache of decoded raw planes keyed by file path.

    Microscopy pretrain datasets are often small enough to hold decoded
    (50-100 KB/plane at 224px uint8): with the cache on, every epoch after the
    first is decode-free and the host pipeline runs at memcpy speed — a
    steady-state the reference's DALI pipeline cannot reach (it re-decodes
    every epoch, ``dali_dataloader.py:453-591``). Bounded by ``max_bytes``
    (insertions stop at the cap; already-cached planes keep serving).

    Thread-safe under HostLoader's worker threads: dict get/set are GIL-atomic
    and entries are immutable once inserted — a lost insert race costs one
    duplicate decode, never a wrong result."""

    def __init__(self, max_bytes: Optional[int] = None):
        self.store: dict = {}
        self.max_bytes = max_bytes
        self.bytes = 0

    def __contains__(self, path: str) -> bool:
        return path in self.store

    def get(self, path: str):
        return self.store.get(path)

    def put(self, path: str, plane: np.ndarray) -> None:
        if path in self.store:
            return
        if self.max_bytes is not None and self.bytes + plane.nbytes > self.max_bytes:
            return
        self.store[path] = plane
        self.bytes += plane.nbytes


def make_dense_batch_fn(dataset, size: int, num_threads: int = 4,
                        out_depth: int = 8, regression: bool = False,
                        cache: Optional[DecodedPlaneCache] = None):
    """Build a ``HostLoader(native_batch_fn=...)`` whole-batch fast path over a
    manifest dataset (``dataset.file_list`` rows = (name, target, plane_paths)).

    The batch is decoded entirely in the C++ threadpool into the dense RAW
    integer layout — no per-plane Python, GIL released for the batch (the
    DALI-role production path shared by the train loop and bench.py).
    Missing targets (unlabeled pretrain manifests) become -1. With ``cache``
    set, decoded planes are reused across epochs (see
    :class:`DecodedPlaneCache`); only cache-missing images are decoded."""
    dtype = np.uint16 if out_depth == 16 else np.uint8

    def batch_fn(idxs, width):
        rows = [dataset.file_list[int(i)] for i in idxs]
        if cache is None:
            images, counts = load_dense_batch_raw(
                [r[2] for r in rows], width, size, size,
                num_threads=num_threads, out_depth=out_depth)
        else:
            b = len(rows)
            images = np.zeros((b, width, size, size), dtype)
            counts = np.asarray([min(len(r[2]), width) for r in rows], np.int32)
            missing = [i for i, r in enumerate(rows)
                       if any(p not in cache for p in r[2][:width])]
            if missing:
                dec, _ = load_dense_batch_raw(
                    [rows[i][2] for i in missing], width, size, size,
                    num_threads=num_threads, out_depth=out_depth)
                for k, i in enumerate(missing):
                    images[i] = dec[k]
                    for j, p in enumerate(rows[i][2][:width]):
                        cache.put(p, dec[k, j].copy())  # exact bytes, no pad planes
            missing_set = set(missing)
            for i, r in enumerate(rows):
                if i in missing_set:
                    continue
                for j, p in enumerate(r[2][:width]):
                    images[i, j] = cache.get(p)
        if regression:
            labels = np.asarray([float(r[1]) for r in rows], np.float32)
        else:
            labels = np.asarray(
                [int(r[1]) if r[1] is not None else -1 for r in rows], np.int32)
        return {"images": images, "channel_counts": counts, "labels": labels}

    return batch_fn


class NativeEvalLoader:
    """Batch loader for eval paths (deterministic resize transform) that keeps
    the whole decode+resize in C++: the fast path behind ``main_knn`` /
    ``main_umap`` / frozen ``main_linear`` feature extraction."""

    def __init__(self, dataset, batch_size: int, max_channels: int,
                 height: int, width: int, num_threads: int = 8, scale: float = 1.0,
                 drop_last: bool = False, resize_mode: int = 0,
                 resize_size: int = 0, normalize: bool = True):
        # dataset must expose .file_list rows (image_id, target, paths)
        self.rows = list(dataset.file_list)
        self.task = getattr(dataset, "task", "classification")
        self.batch_size = batch_size
        self.max_channels = max_channels
        self.height, self.width = height, width
        self.num_threads = num_threads
        self.scale = scale
        self.drop_last = drop_last
        self.resize_mode = resize_mode
        self.resize_size = resize_size
        self.normalize = normalize

    def __len__(self):
        n = len(self.rows)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        for s in range(0, len(self)):
            rows = self.rows[s * self.batch_size : (s + 1) * self.batch_size]
            if not rows:
                return
            paths = [r[2] for r in rows]
            images, counts = load_dense_batch(paths, self.max_channels,
                                              self.height, self.width,
                                              self.num_threads, self.scale,
                                              resize_mode=self.resize_mode,
                                              resize_size=self.resize_size,
                                              normalize=self.normalize)
            labels = np.asarray(
                [float(r[1]) if self.task == "regression" else int(r[1]) for r in rows])
            yield {"images": images, "channel_counts": counts, "labels": labels}
