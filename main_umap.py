"""UMAP visualization of frozen features (reference ``main_umap.py`` /
``src/utils/auto_umap.py:231-476``).

Extracts features with the validation transform, projects to 2-D, and saves a
class-colored scatter (PNG + PDF). ``data.multi_labels`` bit-unpacking for the
BBBC021xBray set follows the reference exactly — ``(dataset_idx << 10) |
compound`` (``custom_datasets.py:435``) — and additionally produces the
common-compound dual-dataset overlay (reference ``plot_multi_labels``,
``auto_umap.py:347-446``)."""

import numpy as np

from chadavit_tpu.cli import load_backbone_for_eval, load_cfg
from chadavit_tpu.config import parse_umap_cfg
from chadavit_tpu.data.classification import dataset_img_channels, prepare_data
from chadavit_tpu.eval.features import extract_features, make_feature_fn
from chadavit_tpu.utils.auto_umap import plot_common_compounds, plot_scatter, project_2d
from chadavit_tpu.utils.misc import resolve_seed


def main(argv=None):
    cfg = parse_umap_cfg(load_cfg(argv, description=__doc__))
    model, params = load_backbone_for_eval(cfg)

    bk = cfg.backbone.get("kwargs", {})
    img_channels = cfg.data.get("img_channels", dataset_img_channels(cfg.data.dataset))
    max_channels = (bk.get("max_number_channels", img_channels)
                    if cfg.backbone.name in ("vit_channels", "chada_vit") else img_channels)
    train_loader, _ = prepare_data(
        cfg.data.dataset,
        train_path=cfg.data.get("train_path"),
        val_path=None,
        batch_size=cfg.optimizer.get("batch_size", 64),
        max_channels=max_channels,
        num_workers=cfg.data.get("num_workers", 4),
        crop_size=cfg.data.get("augmentations", {}).get("crop_size", 224),
        sample_ratio=cfg.data.get("sample_ratio", 1.0),  # reference main_umap.py:97
        subset_seed=resolve_seed(cfg),
        val_transform_for_train=True,
        native_loader=cfg.get("native_loader", False),
    )
    feature_fn = make_feature_fn(
        model, cfg.get("channels_strategy"),
        return_all_tokens=bk.get("return_all_tokens", False),
        mixed_channels=cfg.get("mixed_channels", False),
        img_channels=img_channels,
    )
    feats, targets = extract_features(train_loader, feature_fn, params)
    emb = project_2d(feats, seed=resolve_seed(cfg))

    from chadavit_tpu.data.datasets import DATASETS

    names = getattr(DATASETS.get(cfg.data.dataset), "int_to_labels", None)
    if cfg.data.get("multi_labels"):
        # bit-packed (dataset_idx << 10) | compound (reference
        # custom_datasets.py:435, decoded as in auto_umap.py:388-390)
        dataset_idx = targets >> 10
        compound_idx = targets & 0x3FF
        plot_scatter(emb, dataset_idx, f"{cfg.name}_umap_dataset")
        plot_scatter(emb, compound_idx, f"{cfg.name}_umap_class", names)
        plot_common_compounds(emb, dataset_idx, compound_idx,
                              f"{cfg.name}_umap_common_compounds")
        print(f"saved {cfg.name}_umap_common_compounds.png")
    else:
        plot_scatter(emb, targets, f"{cfg.name}_umap", names)
    print(f"saved {cfg.name}_umap.png/.pdf")


if __name__ == "__main__":
    main()
