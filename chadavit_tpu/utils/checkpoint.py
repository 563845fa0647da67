"""Checkpointing + auto-resume (reference ``src/utils/checkpointer.py`` and
``src/utils/auto_resumer.py``), orbax-backed.

Layout mirrors the reference contract so tooling carries over:
``{dir}/{method}/{run_id}/{name}-{run_id}-ep={N}`` plus an ``args.json``
sidecar dumping the full config (reference ``checkpointer.py:104-146``); the
previous checkpoint is deleted unless ``keep_prev``. Auto-resume scans every
run's ``args.json`` for the 12 SHOULD_MATCH keys and returns the newest
checkpoint younger than ``max_hours`` (reference ``auto_resumer.py:16-29,65-107``).

The saved pytree is the full train state: for DINO that is
{student, teacher, opt_state, center, step} — preemption-safe resume of the
whole optimization, not just weights.
"""

from __future__ import annotations

import json
import os
import random
import re
import shutil
import string
import time
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

SHOULD_MATCH = [
    "name",
    "backbone",
    "method",
    "data.dataset",
    "max_epochs",
    "optimizer.name",
    "optimizer.batch_size",
    "optimizer.lr",
    "optimizer.weight_decay",
    "wandb.project",
    "wandb.entity",
    "pretrained_feature_extractor",
]


def _get_dotted(d: dict, path: str):
    node = d
    for p in path.split("."):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _random_run_id(n: int = 8) -> str:
    return "offline-" + "".join(random.choices(string.ascii_lowercase + string.digits, k=n))


def save_pytree(path: str, tree: Any):
    """Save a pytree of arrays with orbax (fallback: npz of flattened leaves)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree)
        ckptr.wait_until_finished()
    else:  # pragma: no cover
        os.makedirs(path, exist_ok=True)
        flat, treedef = jax.tree.flatten(tree)
        np.savez(os.path.join(path, "leaves.npz"),
                 **{str(i): np.asarray(x) for i, x in enumerate(flat)})
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))


def restore_pytree(path: str, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree` into ``target``'s structure."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target)
    flat, treedef = jax.tree.flatten(target)  # pragma: no cover
    data = np.load(os.path.join(path, "leaves.npz"))
    return jax.tree.unflatten(treedef, [data[str(i)] for i in range(len(flat))])


class Checkpointer:
    """Per-epoch checkpointer with the reference's directory contract."""

    def __init__(self, cfg, base_dir: Optional[str] = None, frequency: int = 1,
                 keep_prev: bool = False, run_id: Optional[str] = None):
        self.cfg = cfg
        base = Path(base_dir or _get_dotted(cfg, "checkpoint.dir") or "trained_models")
        method = _get_dotted(cfg, "method") or "base"
        self.run_id = run_id or _random_run_id()
        self.path = base / method / self.run_id
        self.name = _get_dotted(cfg, "name") or "run"
        self.frequency = frequency
        self.keep_prev = keep_prev
        self.last_ckpt: Optional[Path] = None
        self.path.mkdir(parents=True, exist_ok=True)
        self._save_args()

    def _save_args(self):
        args = self.cfg.to_dict() if hasattr(self.cfg, "to_dict") else dict(self.cfg)
        args["wandb_run_id"] = self.run_id
        with open(self.path / "args.json", "w") as f:
            json.dump(args, f, default=lambda o: "<not serializable>")

    def ckpt_path(self, epoch: int) -> Path:
        return self.path / f"{self.name}-{self.run_id}-ep={epoch}"

    def step_ckpt_path(self, step: int) -> Path:
        return self.path / f"{self.name}-{self.run_id}-step={step}"

    def _save(self, state: Any, ckpt: Path):
        save_pytree(str(ckpt), state)
        if self.last_ckpt and self.last_ckpt != ckpt and not self.keep_prev:
            shutil.rmtree(self.last_ckpt, ignore_errors=True)
        self.last_ckpt = ckpt

    def save(self, state: Any, epoch: int):
        if epoch % self.frequency != 0:
            return
        self._save(state, self.ckpt_path(epoch))

    def save_step(self, state: Any, step: int):
        """Mid-epoch checkpoint (preemption safety — the reference requeues via
        ``SLURMEnvironment(requeue_signal=SIGUSR1)``, ``main_pretrain.py:304-306``;
        here the state snapshot at an exact global step serves the same role)."""
        self._save(state, self.step_ckpt_path(step))


class AutoResumer:
    """Find the newest compatible checkpoint to resume from."""

    SHOULD_MATCH = SHOULD_MATCH

    def __init__(self, checkpoint_dir: str = "trained_models", max_hours: float = 36):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.max_seconds = max_hours * 3600

    def find_checkpoint(self, cfg) -> Tuple[Optional[str], Optional[str]]:
        """Returns (checkpoint_path, run_id) or (None, None)."""
        want = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
        candidates = []
        if not self.checkpoint_dir.exists():
            return None, None
        for args_json in self.checkpoint_dir.glob("**/args.json"):
            try:
                with open(args_json) as f:
                    args = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if any(_get_dotted(args, k) != _get_dotted(want, k) for k in self.SHOULD_MATCH):
                continue
            run_dir = args_json.parent
            for ckpt in run_dir.iterdir():
                m = re.search(r"-(?:ep|step)=(\d+)$", ckpt.name)
                if not m or not ckpt.is_dir():
                    continue
                age = time.time() - ckpt.stat().st_mtime
                if age <= self.max_seconds:
                    candidates.append((ckpt.stat().st_mtime, int(m.group(1)),
                                       str(ckpt), args.get("wandb_run_id")))
        if not candidates:
            return None, None
        candidates.sort()
        _, _, path, run_id = candidates[-1]
        return path, run_id
