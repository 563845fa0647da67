"""UMAP visualization of frozen features (reference ``main_umap.py`` /
``src/utils/auto_umap.py:231-476``).

Extracts features with the validation transform, projects to 2-D, and saves a
class-colored scatter (PNG + PDF). umap-learn is not available in this image,
so the projector falls back to sklearn TSNE (gated import — same plot
contract); ``data.multi_labels`` bit-unpacking for the BBBC021xBray
common-compound plot is honored (reference ``custom_datasets.py:431-435``)."""

import numpy as np

from chadavit_tpu.cli import load_backbone_for_eval, load_cfg
from chadavit_tpu.config import parse_umap_cfg
from chadavit_tpu.data.classification import dataset_img_channels, prepare_data
from chadavit_tpu.eval.features import extract_features, make_feature_fn


def project_2d(features: np.ndarray, seed: int = 5) -> np.ndarray:
    try:
        import umap

        return umap.UMAP(n_components=2, random_state=seed).fit_transform(features)
    except ImportError:
        from sklearn.manifold import TSNE

        perplexity = max(2, min(30, len(features) // 4))
        return TSNE(n_components=2, random_state=seed,
                    perplexity=perplexity).fit_transform(features)


def plot_scatter(emb: np.ndarray, labels: np.ndarray, path_base: str, label_names=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    classes = np.unique(labels)
    cmap = plt.get_cmap("tab20")
    for i, c in enumerate(classes):
        m = labels == c
        name = label_names.get(int(c), str(c)) if label_names else str(c)
        ax.scatter(emb[m, 0], emb[m, 1], s=4, color=cmap(i % 20), label=name)
    if len(classes) <= 25:
        ax.legend(markerscale=3, fontsize=7)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(path_base + ".png", dpi=200)
    fig.savefig(path_base + ".pdf")
    plt.close(fig)


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
    emb = project_2d(feats, seed=cfg.get("seed") or 5)

    from chadavit_tpu.data.datasets import DATASETS

    names = getattr(DATASETS.get(cfg.data.dataset), "int_to_labels", None)
    if cfg.data.get("multi_labels"):
        # bit-packed (dataset_id * 1000 + class): plot both factors
        plot_scatter(emb, targets // 1000, f"{cfg.name}_umap_dataset")
        plot_scatter(emb, targets % 1000, f"{cfg.name}_umap_class", names)
    else:
        plot_scatter(emb, targets, f"{cfg.name}_umap", names)
    print(f"saved {cfg.name}_umap.png/.pdf")


if __name__ == "__main__":
    main()
