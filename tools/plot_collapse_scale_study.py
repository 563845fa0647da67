"""Overlay DINO-health curves from several pretrain runs on one figure.

Companion to ``plot_training_curves.py`` (single-run panels): this renders
the collapse-scale study — the same three health metrics (loss, teacher
entropy vs ln K, center norm) for N runs on shared epoch axes, so the
uniform-fixed-point collapse (loss = teacher entropy = ln K, center norm
decaying to 0 — see ROADMAP round-4 block) is visible as curves pinning to
the dashed ln K line while a healthy run separates below it.

Usage:
    python tools/plot_collapse_scale_study.py out.png LABEL=logs.txt [LABEL=logs.txt ...]

Each ``logs.txt`` is a MetricLogger JSONL file (``training_logs.txt``). The
x-axis is fractional epoch (step / steps-per-epoch inferred from the log's
own epoch column) so runs with different dataset sizes are comparable.
"""

from __future__ import annotations

import math
import sys

from plot_training_curves import load, series  # noqa: E402 (same dir)


def epochs_axis(rows):
    """Fractional epoch per logged step, from the log's own epoch column.

    The epoch field is integral per row; steps-per-epoch is inferred from
    the first epoch boundary so intra-epoch progress interpolates linearly.
    """
    steps, eps = series(rows, "epoch")
    if not steps:
        return steps
    spe = None
    for s, e in zip(steps, eps):
        if e >= 1.0:
            spe = s / e
            break
    spe = spe or max(steps)
    return [s / spe for s in steps]


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    out = sys.argv[1]
    runs = []
    for arg in sys.argv[2:]:
        label, _, path = arg.rpartition("=")  # labels may themselves contain '='
        rows = load(path)
        if not rows:
            print(f"no parseable rows in {path}", file=sys.stderr)
            return 1
        runs.append((label, rows))

    metrics = [
        ("dino_loss", "DINO loss"),
        ("teacher_entropy", "teacher entropy (per-sample)"),
        ("center_norm", "center L2 norm"),
    ]
    fig, axes = plt.subplots(1, len(metrics), figsize=(5.2 * len(metrics), 4.0))
    ln_k = None
    for ax, (key, title) in zip(axes, metrics):
        for label, rows in runs:
            ex = epochs_axis(rows)
            xs, ys = series(rows, key)
            # series() filters rows missing the key; re-map onto epoch axis
            step_to_ep = dict(zip(series(rows, "epoch")[0], ex))
            exs = [step_to_ep.get(s) for s in xs]
            ax.plot(exs, ys, label=label, linewidth=1.4)
        if key in ("dino_loss", "teacher_entropy"):
            # every run here uses 4096 prototypes; ln K is the uniform fixed point
            ln_k = math.log(4096)
            ax.axhline(ln_k, color="gray", linestyle="--", linewidth=1.0,
                       label="ln K (uniform)")
        ax.set_title(title)
        ax.set_xlabel("epoch")
        ax.grid(True, alpha=0.3)
    axes[0].legend(fontsize=8)
    fig.suptitle("DINO canonical recipe: collapse vs scale / unfreeze timing")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out} ({len(runs)} runs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
