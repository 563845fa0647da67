"""UMAP visualization utilities (reference ``src/utils/auto_umap.py``).

- :func:`project_2d` / :func:`plot_scatter`: shared by the offline
  ``main_umap.py`` entry point and the training-time callback.
- :class:`AutoUMAP`: epoch-end hook writing a class-colored UMAP of the
  validation features into the run directory (reference ``AutoUMAP``
  callback, ``auto_umap.py:45-228``: plots every ``frequency`` validation
  epochs as ``umap_ep={N}.png``).
- :func:`plot_common_compounds`: the dual-dataset overlay for BBBC021xBray —
  compounds present in BOTH datasets get colors, the rest light gray
  (reference ``plot_multi_labels``, ``auto_umap.py:347-446``).

umap-learn is not available in this image, so the projector falls back to
sklearn TSNE (gated import — same plot contract).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def project_2d(features: np.ndarray, seed: int = 5) -> np.ndarray:
    try:
        import umap

        return umap.UMAP(n_components=2, random_state=seed).fit_transform(features)
    except ImportError:
        from sklearn.manifold import TSNE

        perplexity = max(2, min(30, len(features) // 4))
        return TSNE(n_components=2, random_state=seed,
                    perplexity=perplexity).fit_transform(features)


def plot_scatter(emb: np.ndarray, labels: np.ndarray, path_base: str,
                 label_names=None, save_pdf: bool = True):
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
    if save_pdf:
        fig.savefig(path_base + ".pdf")
    plt.close(fig)


def plot_common_compounds(emb: np.ndarray, dataset_idx: np.ndarray,
                          compound_idx: np.ndarray, path_base: str):
    """Dual-dataset overlay: color only the compounds appearing in BOTH
    datasets, light gray otherwise (reference ``plot_multi_labels``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    datasets = np.unique(dataset_idx)
    common = compound_idx
    if len(datasets) >= 2:
        common = np.intersect1d(compound_idx[dataset_idx == datasets[0]],
                                compound_idx[dataset_idx == datasets[1]])
    cmap = plt.get_cmap("hsv")
    colors = {int(c): cmap(i / max(len(common), 1)) for i, c in enumerate(np.unique(common))}

    fig, ax = plt.subplots(figsize=(10, 10))
    markers = ["o", "s", "D", "^", "v"]
    for i, ds in enumerate(datasets):
        m = dataset_idx == ds
        cs = [colors.get(int(c), (0.83, 0.83, 0.83, 0.5)) for c in compound_idx[m]]
        ax.scatter(emb[m, 0], emb[m, 1], s=24, c=cs, marker=markers[i % len(markers)],
                   alpha=0.6, linewidths=0)
    handles = [plt.Line2D([0], [0], marker="o", color="w", label=f"compound {c}",
                          markerfacecolor=col, markersize=8)
               for c, col in colors.items()]
    if handles and len(handles) <= 30:
        ax.legend(handles=handles, title="common compounds", fontsize=7)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(path_base + ".png", dpi=200)
    plt.close(fig)


class AutoUMAP:
    """Training-time UMAP hook: call :meth:`maybe_plot` at each validation
    epoch; writes ``umap_ep={N}.png`` into ``out_dir`` every ``frequency``
    epochs (matching the reference's ``umap_placeholder`` naming)."""

    def __init__(self, out_dir: str, frequency: int = 1):
        self.out_dir = out_dir
        self.frequency = max(1, int(frequency))
        os.makedirs(out_dir, exist_ok=True)

    def maybe_plot(self, epoch: int, feats: np.ndarray, targets: np.ndarray,
                   seed: int = 5) -> Optional[str]:
        if epoch % self.frequency != 0 or len(feats) < 8:
            return None
        emb = project_2d(feats, seed=seed)
        base = os.path.join(self.out_dir, f"umap_ep={epoch}")
        plot_scatter(emb, targets, base, save_pdf=False)
        return base + ".png"
