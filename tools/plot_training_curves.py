"""Plot training curves from a run's ``training_logs.txt`` (the offline JSONL
metric log written by :class:`chadavit_tpu.utils.logging.MetricLogger`).

The reference replays its offline log into wandb at job end
(``src/utils/slurm_logger.py:94-110``, ``main_pretrain.py:333-351``); this is
the network-free equivalent: one PNG with the training-dynamics panels that
matter for DINO health (loss, teacher entropy vs ln K, center norm, lr/tau
schedules, online/val accuracy curves).

Usage:
    python tools/plot_training_curves.py /path/to/training_logs.txt [out.png]
"""

from __future__ import annotations

import json
import math
import sys


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def series(rows, key):
    xs, ys = [], []
    for r in rows:
        if key in r and "step" in r:
            xs.append(r["step"])
            ys.append(r[key])
    return xs, ys


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "training_curves.png"
    rows = load(path)
    if not rows:
        print(f"no parseable rows in {path}", file=sys.stderr)
        return 1

    panels = [
        ("dino_loss", "DINO loss", {}),
        ("teacher_entropy", "teacher entropy (per-sample)", {}),
        ("val_knn_top1", "val kNN top-1 (%)", {"marker": "o"}),
        ("train_acc1", "online classifier top-1 (%)", {"alpha": 0.6}),
        ("lr", "learning rate", {}),
        ("tau", "EMA tau", {}),
        ("center_norm", "center L2 norm", {}),
        ("teacher_temp", "teacher temperature", {}),
        ("dino_loss_val", "held-out DINO loss", {"marker": "o"}),
    ]
    have = [(k, t, kw) for k, t, kw in panels if series(rows, k)[0]]
    if not have:
        print("no known metric keys found", file=sys.stderr)
        return 1
    ncol = 3
    nrow = math.ceil(len(have) / ncol)
    fig, axes = plt.subplots(nrow, ncol, figsize=(4.2 * ncol, 3.0 * nrow),
                             squeeze=False)
    for i, (k, title, kw) in enumerate(have):
        ax = axes[i // ncol][i % ncol]
        xs, ys = series(rows, k)
        ax.plot(xs, ys, **kw)
        if k == "teacher_entropy":
            # uniform-output level: ln(num_prototypes); infer from max seen
            ln_k = max(ys)
            ax.axhline(ln_k, ls="--", lw=0.8, color="gray")
            ax.annotate("ln K", (xs[0], ln_k), fontsize=8, color="gray")
        ax.set_title(title, fontsize=10)
        ax.set_xlabel("step", fontsize=8)
        ax.tick_params(labelsize=8)
        ax.grid(alpha=0.3)
    for j in range(len(have), nrow * ncol):
        axes[j // ncol][j % ncol].axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({len(rows)} log rows, {len(have)} panels)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
