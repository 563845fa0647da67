"""Offline weighted k-NN evaluation on frozen features (reference ``main_knn.py``).

Extracts train+test features with the *validation* transform for both splits
(reference ``main_knn.py:205-223``), then grids over
feature_type x k x distance x temperature and writes
``{name}_knn_offline_eval.csv``.

Deviation from the reference: a CSV row is written for *every* temperature in
the grid (the reference's writerow sits outside its temperature loop,
``main_knn.py:152``, recording only the last T — an apparent bug)."""

import csv

from chadavit_tpu.cli import load_backbone_for_eval, load_cfg
from chadavit_tpu.config import parse_knn_cfg
from chadavit_tpu.data.classification import dataset_img_channels, prepare_data
from chadavit_tpu.eval.features import extract_features, make_feature_fn
from chadavit_tpu.eval.knn import knn_classify
from chadavit_tpu.utils.misc import resolve_seed, seed_everything


def main(argv=None):
    cfg = parse_knn_cfg(load_cfg(argv, description=__doc__))
    # reference main_knn.py:164 seed_everything_manual(cfg.seed): host RNGs
    # must be seeded before dataset construction (sample_ratio subset draw)
    seed_everything(resolve_seed(cfg))
    model, params = load_backbone_for_eval(cfg)

    img_channels = cfg.data.get("img_channels", dataset_img_channels(cfg.data.dataset))
    bk = cfg.backbone.get("kwargs", {})
    max_channels = (bk.get("max_number_channels", img_channels)
                    if cfg.backbone.name in ("vit_channels", "chada_vit") else img_channels)
    train_loader, val_loader = prepare_data(
        cfg.data.dataset,
        train_path=cfg.data.get("train_path"),
        val_path=cfg.data.get("val_path"),
        batch_size=cfg.optimizer.get("batch_size", 64),
        max_channels=max_channels,
        num_workers=cfg.data.get("num_workers", 4),
        crop_size=cfg.data.get("augmentations", {}).get("crop_size", 224),
        sample_ratio=cfg.data.get("sample_ratio", 1.0),
        subset_seed=resolve_seed(cfg),
        val_transform_for_train=True,  # val transform for BOTH splits
        native_loader=cfg.get("native_loader", False),
        bucket_round=int(cfg.data.get("bucket_round", 1)),
    )

    feature_fn = make_feature_fn(
        model, cfg.get("channels_strategy"),
        return_all_tokens=bk.get("return_all_tokens", False),
        mixed_channels=cfg.get("mixed_channels", False),
        img_channels=img_channels,
    )
    train_f, train_t = extract_features(train_loader, feature_fn, params)
    test_f, test_t = extract_features(val_loader or train_loader, feature_fn, params)
    features = {"backbone": (train_f, test_f)}

    grid = cfg.knn_eval_offline
    csv_filename = f"{cfg.name}_knn_offline_eval.csv"
    with open(csv_filename, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["Feature Type", "Distance Function", "k", "T", "acc@1", "acc@5"])
        for feat_type in grid.feature_type:
            if feat_type not in features:
                continue
            tr_f, te_f = features[feat_type]
            for k in grid.k:
                for distance_fx in grid.distance_function:
                    temps = grid.temperature if distance_fx == "cosine" else [None]
                    for T in temps:
                        acc1, acc5 = knn_classify(
                            tr_f, train_t, te_f, test_t, k=int(k),
                            T=float(T) if T is not None else 0.07,
                            distance_fx=distance_fx,
                            num_classes=cfg.data.num_classes,
                        )
                        print(f"knn feat={feat_type} d={distance_fx} k={k} T={T}: "
                              f"acc@1={acc1:.2f} acc@5={acc5:.2f}")
                        writer.writerow([feat_type, distance_fx, k, T, acc1, acc5])
    print("Results of KNN offline eval written to", csv_filename)


if __name__ == "__main__":
    main()
