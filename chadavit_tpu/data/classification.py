"""Classification/eval data module (reference
``src/data/classification_dataloader.py``): per-dataset train/val transform
pipelines + train/val loaders with dense collation.

The reference hardcodes one albumentations pipeline per dataset
(``classification_dataloader.py:63-304``); all follow the same shape —
train: random-resized-crop + flip (+ per-channel jitter for microscopy),
val: deterministic resize — parameterized here per dataset."""

from __future__ import annotations

from typing import Optional, Tuple

from chadavit_tpu.data.datasets import DATASETS, prepare_datasets
from chadavit_tpu.data.pipeline import HostLoader
from chadavit_tpu.data.transforms import AugmentationPipeline

# datasets whose channels are raw microscopy planes -> per-channel jitter
_MICROSCOPY = {"idrcell100k", "idrcell100k_3channels", "bray", "bbbc021",
               "bbbc048", "cyclops", "transloc", "mtbenchreg", "bbbc021xbray"}


def prepare_transforms(dataset: str, crop_size: int = 224,
                       augment_train: bool = True) -> Tuple[AugmentationPipeline, AugmentationPipeline]:
    """(train_transform, val_transform) per dataset (reference
    ``classification_dataloader.py:53-304``)."""
    train_cfg = {
        "crop_size": crop_size,
        "rrc": {"enabled": augment_train, "crop_min_scale": 0.08, "crop_max_scale": 1.0},
        "horizontal_flip": {"prob": 0.5 if augment_train else 0.0},
    }
    if augment_train and dataset in _MICROSCOPY:
        train_cfg["color_jitter"] = {"prob": 0.8}
    val_cfg = {"crop_size": crop_size, "rrc": {"enabled": False}}
    return AugmentationPipeline(train_cfg), AugmentationPipeline(val_cfg)


def prepare_data(
    dataset: str,
    train_path: Optional[str],
    val_path: Optional[str],
    batch_size: int,
    max_channels: int,
    num_workers: int = 4,
    crop_size: int = 224,
    sample_ratio: float = 1.0,
    augment_train: bool = True,
    val_transform_for_train: bool = False,
    seed: int = 0,
    native_loader: bool = False,
    **dataset_kwargs,
) -> Tuple[HostLoader, Optional[HostLoader]]:
    """Build (train_loader, val_loader) (reference
    ``classification_dataloader.py:508-582``; ``main_knn.py:205-223`` passes the
    *val* transform for both splits via ``val_transform_for_train``).

    ``native_loader=True`` (eval paths only: deterministic resize transform)
    swaps in :class:`chadavit_tpu.data.native.NativeEvalLoader` — the whole
    decode+resize runs in the C++ threadpool. Note: the native path resizes
    bilinearly while the host path uses cubic; features differ slightly."""
    if native_loader and val_transform_for_train:
        from chadavit_tpu.data import native

        if native.is_available() and dataset != "synthetic":
            train_ds = prepare_datasets(dataset, transform=None, train_path=train_path,
                                        train=True, sample_ratio=sample_ratio,
                                        **dataset_kwargs)
            tl = native.NativeEvalLoader(train_ds, batch_size=batch_size,
                                         max_channels=max_channels,
                                         height=crop_size, width=crop_size)
            vl = None
            if val_path is not None:
                val_ds = prepare_datasets(dataset, transform=None,
                                          train_path=val_path, train=False,
                                          **dataset_kwargs)
                vl = native.NativeEvalLoader(val_ds, batch_size=batch_size,
                                             max_channels=max_channels,
                                             height=crop_size, width=crop_size)
            return tl, vl

    t_train, t_val = prepare_transforms(dataset, crop_size, augment_train)
    if val_transform_for_train:
        t_train = t_val

    synth = dict(img_size=crop_size, max_channels=max_channels) if dataset == "synthetic" else {}
    train_ds = prepare_datasets(dataset, transform=t_train, train_path=train_path,
                                train=True, sample_ratio=sample_ratio,
                                **synth, **dataset_kwargs)
    train_loader = HostLoader(train_ds, batch_size=batch_size, max_channels=max_channels,
                              num_workers=num_workers, seed=seed,
                              shuffle=not val_transform_for_train, drop_last=False)
    val_loader = None
    if val_path is not None or dataset == "synthetic":
        val_ds = prepare_datasets(dataset, transform=t_val, train_path=val_path or train_path,
                                  train=False, **synth, **dataset_kwargs)
        val_loader = HostLoader(val_ds, batch_size=batch_size, max_channels=max_channels,
                                num_workers=num_workers, seed=seed,
                                shuffle=False, drop_last=False)
    return train_loader, val_loader


def dataset_img_channels(dataset: str, default: int = 3) -> int:
    cls = DATASETS.get(dataset)
    return getattr(cls, "img_channels", default) if cls else default
