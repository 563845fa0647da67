"""Summarize a DINO pretrain MetricLogger JSONL for the collapse-scale study.

Prints the escape/collapse fingerprint used in ``studies/collapse_scale``:
deepest-escape row (minimum teacher entropy), the re-pin row (first return to
within 0.01 of ln K after the minimum — the lr there brackets the kill
threshold), and every online-kNN eval row. Works on ``training_logs.txt``
files and the committed study ``.jsonl`` snapshots (same format).

Usage: python tools/summarize_collapse_run.py <logs.jsonl> [num_prototypes=4096]
"""

import json
import math
import sys


def summarize(path: str, num_prototypes: int = 4096) -> dict:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    train = [r for r in rows if "teacher_entropy" in r]
    knn = [r for r in rows if "val_knn_top1" in r]
    if not train:
        return {"error": "no training rows"}
    ln_k = math.log(num_prototypes)
    lo = min(train, key=lambda r: r["teacher_entropy"])
    repin = next((r for r in train
                  if r["step"] > lo["step"]
                  and r["teacher_entropy"] > ln_k - 0.01), None)
    pick = ("step", "epoch", "lr", "tau", "teacher_entropy", "dino_loss")
    trim = lambda r: {k: round(r[k], 4) for k in pick if k in r}  # noqa: E731
    return {
        "rows": len(train),
        "last_step": max(r["step"] for r in train),
        "ln_k": round(ln_k, 4),
        "min_entropy": trim(lo),
        "repinned": trim(repin) if repin else None,
        "kill_lr_bracket": ([round(lo["lr"], 4), round(repin["lr"], 4)]
                            if repin else None),
        "knn_evals": [{k: round(v, 2) for k, v in r.items() if k != "time"}
                      for r in knn],
    }


if __name__ == "__main__":
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    print(json.dumps(summarize(sys.argv[1], k), indent=1))
