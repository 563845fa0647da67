"""Host data pipeline: dense static-shape collation + threaded prefetching.

TPU-first redesign of the reference's ragged collate (reference
``src/data/channels_strategies.py:31-85`` produces ``(sum(c_i), 1, H, W)``
tensors whose shape changes every batch — a recompile per batch under jit).
Here every batch is dense ``(B, C_max, H, W)`` float32 with a ``(B,)``
channel-count vector; padded channel planes are zero. Shapes are static, so
the train step compiles once.

``HostLoader`` is a threaded prefetcher: worker threads decode+augment+collate
(PIL/cv2 release the GIL for the heavy parts) while the accelerator consumes
previous batches. It replaces torch ``DataLoader`` with
``num_workers``/``pin_memory`` (reference ``pretrain_dataloader.py:499-526``);
the C++ decode path (:mod:`chadavit_tpu.data.native`) plugs in underneath.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def _to_dense(images: Sequence[np.ndarray], max_channels: int,
              channels_last: bool = False, dtype=np.float32) -> tuple:
    """CHW images (HWC when ``channels_last``) with ragged channel counts ->
    (B, C_max, H, W) + counts."""
    b = len(images)
    if channels_last:
        images = [np.ascontiguousarray(img.transpose(2, 0, 1)) for img in images]
    h, w = images[0].shape[-2:]
    out = np.zeros((b, max_channels, h, w), dtype)
    counts = np.empty((b,), np.int32)
    for i, img in enumerate(images):
        c = min(img.shape[0], max_channels)
        out[i, :c] = img[:c]
        counts[i] = c
    return out, counts


def dense_collate(batch: List, max_channels: int,
                  channels_last: bool = False, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Collate ``[(img_or_crops, label), ...]`` (optionally ``(idx, img, label)``)
    into dense arrays. Multi-crop samples produce ``crops`` stacked crop-major
    ``(num_crops, B, C_max, H, W)`` grouped by crop size; single images produce
    ``images`` ``(B, C_max, H, W)``.

    Layout contract: augmented samples are CHW (AugmentationPipeline output);
    raw dataset samples are HWC — pass ``channels_last=True`` for those."""
    first = batch[0]
    *_, images, labels_probe = first[-2:]
    labels = np.asarray([b[-1] for b in batch])
    if isinstance(labels_probe, (int, float, np.integer, np.floating)):
        labels = labels.astype(np.float32 if isinstance(labels_probe, float) else np.int32)

    samples = [b[-2] for b in batch]
    if isinstance(samples[0], list):  # multi-crop
        num_crops = len(samples[0])
        sizes = [c.shape[-1] for c in samples[0]]
        big = sizes[0]
        large_idx = [i for i, s in enumerate(sizes) if s == big]
        small_idx = [i for i, s in enumerate(sizes) if s != big]
        out: Dict[str, np.ndarray] = {"labels": labels}

        def stack(idxs):
            crops, counts = [], None
            for ci in idxs:
                dense, counts = _to_dense([s[ci] for s in samples], max_channels,
                                          channels_last, dtype)
                crops.append(dense)
            return np.stack(crops, 0), counts

        out["crops"], out["channel_counts"] = stack(large_idx)
        if small_idx:
            out["small_crops"], _ = stack(small_idx)
        assert len(large_idx) + len(small_idx) == num_crops
        return out

    dense, counts = _to_dense(samples, max_channels, channels_last, dtype)
    return {"images": dense, "channel_counts": counts, "labels": labels}


def one_channel_flatten(images: np.ndarray, channel_counts: np.ndarray) -> np.ndarray:
    """Dense (B, C_max, H, W) -> reference-style ragged (sum(c_i), 1, H, W)
    (the inverse of densify; for `one_channel` strategy code paths)."""
    planes = [images[i, :c] for i, c in enumerate(channel_counts)]
    return np.concatenate(planes, axis=0)[:, None]


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


class HostLoader:
    """Threaded prefetching batch loader with deterministic per-epoch order."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_channels: int,
        collate_fn: Optional[Callable] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        channels_last: bool = False,
        bucket_by_channels: bool = False,
        bucket_round: int = 2,
        dtype=np.float32,
        emit_index: bool = False,
        native_batch_fn: Optional[Callable] = None,
        shard: Optional[tuple] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_channels = max_channels
        self._channels_last = channels_last
        self._user_collate = collate_fn
        self._dtype = dtype
        self.collate_fn = collate_fn or (
            lambda b: dense_collate(b, max_channels, channels_last, dtype))
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        # channel-count bucketing: batch images of similar channel counts and
        # pad only to the batch's (rounded) max — skips the padded-channel
        # FFN/LN/projection work that a fixed C_max layout wastes (up to
        # C_max/c of the non-attention FLOPs; attention already skips via the
        # prefix kernel). Requires dataset.channel_count(i).
        self.bucket_by_channels = bucket_by_channels and hasattr(dataset, "channel_count")
        self.bucket_round = bucket_round
        # bucketing REORDERS batches relative to dataset index order (stable
        # sort by channel count); emit_index adds an "index" key so callers
        # that concatenate per-batch outputs can map them back to dataset order
        self.emit_index = emit_index
        # optional whole-batch fast path: fn(idxs, width) -> batch dict, decoded
        # entirely in the C++ threadpool (bypasses per-sample __getitem__ +
        # collate; the GIL is released for the whole batch)
        self.native_batch_fn = native_batch_fn
        # multi-host DP: (rank, world) keeps every world-th batch of the SAME
        # deterministic global order (seeded shuffle is identical on every
        # host), so processes consume disjoint shards — the TPU-native
        # analogue of the reference DALI pipeline's rank sharding
        # (dali_dataloader.py:765-767). Epoch semantics: one "epoch" spans the
        # global dataset; each host sees len(global)/world batches of it.
        self.shard = shard
        self._shard_widths = None

    def __len__(self) -> int:
        n = len(self.dataset)
        # sharded: the partial tail batch is always dropped (a rank receiving a
        # smaller batch dim would break the identical-global-shape invariant),
        # and every host must see the SAME number of batches or the collective
        # program deadlocks on the ragged tail
        if self.shard is not None:
            return (n // self.batch_size) // self.shard[1]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        rng = np.random.default_rng(self.seed + self.epoch)
        if self.shuffle:
            rng.shuffle(order)
        if self.bucket_by_channels:
            counts = np.asarray([self.dataset.channel_count(int(i)) for i in order])
            order = order[np.argsort(counts, kind="stable")]
        drop_last = self.drop_last or self.shard is not None  # see __len__
        nb = n // self.batch_size if drop_last else -(-n // self.batch_size)
        batches = [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        if self.bucket_by_channels and self.shuffle:
            rng.shuffle(batches)
        self._shard_widths = None
        if self.shard is not None:
            rank, world = self.shard
            groups = [batches[i * world:(i + 1) * world]
                      for i in range(nb // world)]
            if self.bucket_by_channels:
                # all hosts must compile/call the SAME global shape per step:
                # force each world-sized batch group to its max bucket width
                # (identical on every host — the order is deterministic)
                self._shard_widths = [max(self._bucket_width(b) for b in g)
                                      for g in groups]
            batches = [g[rank] for g in groups]
        return batches

    def _bucket_width(self, idxs) -> int:
        cmax = max(self.dataset.channel_count(int(i)) for i in idxs)
        r = self.bucket_round
        return min(((cmax + r - 1) // r) * r, self.max_channels)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iter_from(0)

    def iter_from(self, skip: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate the epoch starting at batch index ``skip`` WITHOUT decoding
        the skipped prefix (mid-epoch preemption resume: re-decoding consumed
        batches just to discard them cost ~5 min per resume at 100k-image
        scale). Batch order/content from ``skip`` on is identical to a full
        epoch — the batch index list is built first, then sliced."""
        batches = self._batches()[skip:]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        it_lock = threading.Lock()
        # bi stays the ABSOLUTE batch index (shard width tables are per-epoch)
        idx_iter = iter(enumerate(batches, start=skip))
        results: Dict[int, Dict] = {}
        res_lock = threading.Lock()
        next_emit = [skip]

        def worker():
            try:
                while not stop.is_set():
                    with it_lock:
                        try:
                            bi, idxs = next(idx_iter)
                        except StopIteration:
                            return
                    forced = (self._shard_widths[bi]
                              if self._shard_widths is not None else None)
                    if self.native_batch_fn is not None:
                        width = forced if forced is not None else (
                            self._bucket_width(idxs)
                            if self.bucket_by_channels else self.max_channels)
                        batch = self.native_batch_fn(idxs, width)
                    elif self.bucket_by_channels and self._user_collate is None:
                        samples = [self.dataset[int(i)] for i in idxs]
                        batch = dense_collate(samples,
                                              forced if forced is not None
                                              else self._bucket_width(idxs),
                                              self._channels_last, self._dtype)
                    else:
                        samples = [self.dataset[int(i)] for i in idxs]
                        batch = self.collate_fn(samples)
                    if self.emit_index and isinstance(batch, dict):
                        batch["index"] = np.asarray(idxs, np.int64)
                    # emit strictly in batch order; puts stay inside the lock so
                    # two workers cannot interleave their ready prefixes. The
                    # put polls `stop` instead of blocking: a consumer that
                    # abandons the epoch early (max_steps truncation,
                    # preemption) must not leave workers parked forever on a
                    # full queue holding res_lock and a batch each
                    with res_lock:
                        results[bi] = batch
                        while next_emit[0] in results:
                            item = results[next_emit[0]]
                            while True:
                                if stop.is_set():
                                    return
                                try:
                                    out_q.put(item, timeout=0.2)
                                    break
                                except queue.Full:
                                    continue
                            results.pop(next_emit[0])
                            next_emit[0] += 1
            except BaseException as e:  # propagate to the consumer
                out_q.put(_WorkerError(e))

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for _ in range(len(batches)):
                item = out_q.get()
                if isinstance(item, _WorkerError):
                    stop.set()
                    raise item.exc
                yield item
        finally:
            stop.set()
        self.epoch += 1


def device_prefetch(iterable, upload: Callable = None, depth: int = 2):
    """Overlap host->device uploads with the consumer's device compute.

    Pulls items from ``iterable`` in ONE background thread, applies ``upload``
    there (e.g. a ``jax.device_put``-based converter; ``None`` = identity),
    and yields the results in order through a bounded queue holding at most
    ``depth`` uploaded batches.

    Why a thread: ``jax.device_put`` is nominally asynchronous, but on
    networked device backends (the tunneled dev TPU; any PJRT-over-RPC
    runtime) issuing the transfer blocks the caller on the wire for
    milliseconds to tens of milliseconds per batch. Issuing batch N+1's
    upload from a side thread hides that latency behind batch N's step —
    the host-side analogue of the reference DALI pipeline's prefetch queue
    (``dali_dataloader.py:453-591``), one level up (host->device rather than
    disk->host, which :class:`HostLoader` already overlaps).

    Exceptions in the producer propagate to the consumer; abandoning the
    generator early (``break``, preemption) stops the producer promptly and
    releases the queued device buffers.
    """
    _end = object()
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not _put(item if upload is None else upload(item)):
                    return
            _put(_end)
        except BaseException as e:  # propagate to the consumer
            _put(_WorkerError(e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _end:
                return
            if isinstance(item, _WorkerError):
                raise item.exc
            yield item
    finally:
        stop.set()


def prepare_dataloader(dataset, batch_size: int, max_channels: int, **kwargs) -> HostLoader:
    """Name-compatible factory (reference ``pretrain_dataloader.py:499``)."""
    return HostLoader(dataset, batch_size=batch_size, max_channels=max_channels, **kwargs)
