"""Export the student backbone of an orbax DINO train-state checkpoint to a
compact compressed ``.npz`` (flattened ``a/b/c`` keys), so study artifacts can
be pinned in the repo instead of living in /tmp (a full train state is ~186 MB;
the ViT-tiny backbone alone is ~12 MB compressed). The eval entry points load
``.npz`` directly via ``pretrained_feature_extractor=<path>.npz``
(``chadavit_tpu/cli.py::load_backbone_for_eval``).

Usage: python tools/export_study_ckpt.py <orbax_ckpt_dir> <out.npz>
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def export(ckpt_dir: str, out_path: str) -> dict:
    from chadavit_tpu.utils.checkpoint import restore_pytree

    tree = restore_pytree(ckpt_dir, None)
    for key in ("student", "backbone"):  # same descent as load_backbone_for_eval
        if isinstance(tree, dict) and key in tree:
            tree = tree[key]
    flat = flatten(tree)
    np.savez_compressed(out_path, **flat)
    meta = {
        "source": os.path.abspath(ckpt_dir),
        "n_arrays": len(flat),
        "n_params": int(sum(a.size for a in flat.values())),
        "bytes_npz": os.path.getsize(out_path),
    }
    # carry the training run's args.json alongside (architecture provenance)
    sidecar = os.path.join(os.path.dirname(ckpt_dir.rstrip("/")), "args.json")
    if os.path.isfile(sidecar):
        meta["train_args"] = json.load(open(sidecar))
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


if __name__ == "__main__":
    m = export(sys.argv[1], sys.argv[2])
    print(json.dumps({k: v for k, v in m.items() if k != "train_args"}))
