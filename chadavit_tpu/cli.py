"""Shared CLI plumbing for the entry points.

Keeps the reference's hydra-style invocation
``python main_X.py --config-path scripts/knn/bbbc048 --config-name dino_chada_vit_moyen.yaml``
(reference ``main_pretrain.py:72``) plus dotted ``key=value`` overrides."""

from __future__ import annotations

import argparse
import os
from typing import Any, List, Optional, Sequence

import jax

from chadavit_tpu.config import Config, load_yaml


def _coerce(v: str) -> Any:
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v == "null" or v == "None":
        return None
    if v.startswith("[") or v.startswith("{"):
        import ast

        try:
            return ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
    return v


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    for ov in overrides:
        if "=" not in ov:
            raise SystemExit(f"override {ov!r} must be key=value")
        key, val = ov.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = Config()
            node = node[p]
        node[parts[-1]] = _coerce(val)
    return cfg


def enable_compile_cache():
    """Persistent XLA compilation cache shared by every entry point.

    Production runs are routinely restarted (preemption + auto-resume); without
    this, each restart re-pays the full remote compile of the train/eval
    programs (minutes per (shape, config) on tunneled TPUs). Directory override:
    ``CHADAVIT_COMPILE_CACHE`` (same default as bench.py / profile tooling)."""
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("CHADAVIT_COMPILE_CACHE", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - older jax without the knob
        pass


def load_cfg(argv: Optional[List[str]] = None, description: str = "") -> Config:
    enable_compile_cache()
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--config-path", default=".", help="directory containing the config")
    ap.add_argument("--config-name", required=True, help="config yaml name")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args(argv)
    name = args.config_name
    if not name.endswith((".yaml", ".yml")):
        name += ".yaml"
    cfg = load_yaml(os.path.join(args.config_path, name))
    return apply_overrides(cfg, args.overrides)


def load_backbone_for_eval(cfg: Config):
    """Build the backbone model + import pretrained weights for an eval entry
    point (reference ``main_knn.py:181-196`` / ``main_linear.py:76-129``).

    The checkpoint may be a torch ``.ckpt``/``.pt`` (remap contract applies) or
    an orbax directory saved by this framework (DinoState: the student backbone
    is used, like the reference's ``model.backbone``)."""
    import jax.numpy as jnp

    from chadavit_tpu.models import get_backbone
    from chadavit_tpu.data.classification import dataset_img_channels

    # rebuild the model config from the checkpoint's args.json sidecar when
    # present (reference main_knn.py:181-196: eval entry points reconstruct the
    # model from the training run's saved config)
    ckpt_probe = cfg.get("pretrained_feature_extractor") or cfg.get("weights_init")
    if ckpt_probe and os.path.isdir(str(ckpt_probe)):
        sidecar = os.path.join(os.path.dirname(str(ckpt_probe).rstrip("/")), "args.json")
        if os.path.isfile(sidecar):
            import json

            saved = json.load(open(sidecar))
            saved_bk = saved.get("backbone", {})
            if saved_bk.get("name"):
                cfg.backbone.name = saved_bk["name"]
                # training-run kwargs define the architecture (they must match
                # the weights); eval-yaml kwargs only fill gaps (e.g. img_size)
                merged = dict(cfg.backbone.get("kwargs", {}))
                merged.update(saved_bk.get("kwargs", {}))
                cfg.backbone.kwargs = merged

    bk = dict(cfg.backbone.get("kwargs", {}))
    strategy = cfg.get("channels_strategy")
    img_channels = cfg.data.get("img_channels", dataset_img_channels(cfg.data.dataset))
    if cfg.backbone.name in ("vit_channels", "chada_vit"):
        pass  # channel-adaptive: no in_chans
    elif strategy == "one_channel":
        bk["in_chans"] = 1
    else:
        bk["in_chans"] = img_channels
    model = get_backbone(cfg.backbone.name, **bk)

    ckpt = cfg.get("pretrained_feature_extractor") or cfg.get("weights_init")
    params = None
    if ckpt and os.path.exists(str(ckpt)):
        ckpt = str(ckpt)
        if os.path.isdir(ckpt):  # orbax train state
            from chadavit_tpu.utils.checkpoint import restore_pytree

            x = jnp.zeros((1, bk.get("max_number_channels", img_channels),
                           224, 224), jnp.float32)
            cc = jnp.ones((1,), jnp.int32)
            init = (model.init(jax.random.PRNGKey(0), x, cc)
                    if cfg.backbone.name in ("vit_channels", "chada_vit")
                    else model.init(jax.random.PRNGKey(0), x))
            restored = restore_pytree(ckpt, None)
            # accept either a bare params tree or a DinoState-like dict
            tree = restored
            for key in ("student", "backbone"):
                if isinstance(tree, dict) and key in tree:
                    tree = tree[key]
            params = tree if isinstance(tree, dict) else init["params"]
        elif ckpt.endswith(".npz"):
            # compact backbone-params export (tools/export_study_ckpt.py):
            # flattened "a/b/c" keys -> nested params tree. Used to pin study
            # checkpoints durably in the repo (a full orbax train state is
            # ~186 MB; the backbone alone round-trips at ~12 MB)
            import numpy as np

            params = {}
            with np.load(ckpt) as z:
                for flat_key in z.files:
                    node = params
                    *parents, leaf = flat_key.split("/")
                    for p in parents:
                        node = node.setdefault(p, {})
                    node[leaf] = jnp.asarray(z[flat_key])
        else:
            from chadavit_tpu.models.import_torch import import_backbone_checkpoint

            params = import_backbone_checkpoint(
                ckpt,
                backbone=cfg.backbone.name,
                depth=bk.get("depth", 12),
                in_chans=bk.get("in_chans", 1),
            )
    if params is None:
        # random init (weights_init: "random-weights", reference main_knn path)
        size = bk.get("img_size", 224)
        cmax = bk.get("max_number_channels", img_channels)
        x = jnp.zeros((1, cmax if cfg.backbone.name in ("vit_channels", "chada_vit")
                       else bk.get("in_chans", img_channels), size, size), jnp.float32)
        if cfg.backbone.name in ("vit_channels", "chada_vit"):
            params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,), jnp.int32))["params"]
        else:
            params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params
