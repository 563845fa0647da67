"""Linear probe / finetune evaluation (reference ``main_linear.py``).

Frozen-or-finetuned backbone + linear classifier with CE (label smoothing /
mixup / cutmix options), warmup-cosine schedule, full metric suite +
confusion-matrix heatmap (reference ``src/methods/linear.py``)."""

import os

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from chadavit_tpu.cli import load_backbone_for_eval, load_cfg
from chadavit_tpu.config import parse_linear_cfg
from chadavit_tpu.data.classification import dataset_img_channels, prepare_data
from chadavit_tpu.eval.features import features_dim, make_feature_fn
from chadavit_tpu.eval.metrics import classification_suite, confusion_matrix, plot_confusion_matrix
from chadavit_tpu.train.schedules import PlateauScale
from chadavit_tpu.eval.probe import ProbeStepConfig, make_probe_eval_step, make_probe_train_step
from chadavit_tpu.train.optim import build_group_tx, grouped_optimizer
from chadavit_tpu.train.state import ProbeState
from chadavit_tpu.utils.misc import HostMemGuard, resolve_seed, seed_everything
from chadavit_tpu.utils.logging import MetricLogger


def build_probe(cfg, model, params, steps_per_epoch, task="classification"):
    bk = cfg.backbone.get("kwargs", {})
    img_channels = cfg.data.get("img_channels", dataset_img_channels(cfg.data.dataset))
    feature_fn = make_feature_fn(
        model, cfg.get("channels_strategy"),
        return_all_tokens=bk.get("return_all_tokens", False),
        mixed_channels=cfg.get("mixed_channels", False),
        img_channels=img_channels,
    )
    num_out = 1 if task == "regression" else cfg.data.num_classes
    feats_dim = features_dim(cfg.get("channels_strategy"), bk.get("embed_dim", 192),
                             getattr(model, "num_patches", 196), img_channels,
                             bk.get("return_all_tokens", False))
    clf = nn.Dense(num_out)
    cparams = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, feats_dim)))["params"]

    total_steps = cfg.max_epochs * steps_per_epoch
    warmup_steps = int(cfg.scheduler.warmup_epochs * steps_per_epoch)
    from chadavit_tpu.train.schedules import make_lr_schedule

    mk_sched = lambda lr: make_lr_schedule(  # noqa: E731
        cfg.scheduler.get("name", "warmup_cosine"), lr, total_steps,
        warmup_steps=warmup_steps, warmup_start_lr=cfg.scheduler.warmup_start_lr,
        min_lr=cfg.scheduler.min_lr,
        decay_steps=[int(s * steps_per_epoch)
                     for s in (cfg.scheduler.get("lr_decay_steps") or [])],
        gamma=cfg.scheduler.get("gamma", 0.1))
    backbone_tx = build_group_tx(cfg.optimizer.name, mk_sched(cfg.optimizer.lr),
                                 cfg.optimizer.weight_decay, dict(cfg.optimizer.get("kwargs", {})),
                                 cfg.optimizer.get("exclude_bias_n_norm_wd", False))
    layer_decay = float(cfg.get("layer_decay", 0.0) or 0.0)
    if layer_decay > 0:
        # layer-wise lr decay (reference linear.py:290-303 / misc.py:364-422):
        # block i gets decay^(depth-i), embeddings decay^(depth+1), final norm 1
        assert cfg.get("finetune", False), "layer_decay requires finetune: True"
        from chadavit_tpu.eval.probe import layer_decay_scales
        from chadavit_tpu.train.optim import scale_updates_by_path

        depth = bk.get("depth", 12)
        key_scales = layer_decay_scales(params, layer_decay, depth)
        backbone_tx = optax.chain(backbone_tx, scale_updates_by_path(key_scales))
    groups = {
        "backbone": backbone_tx,
        # classifier group: own lr, weight decay 0 (reference base.py:406-414)
        "classifier": build_group_tx(cfg.optimizer.name,
                                     mk_sched(cfg.optimizer.get("classifier_lr", cfg.optimizer.lr)),
                                     0.0, dict(cfg.optimizer.get("kwargs", {}))),
    }
    labels = {"backbone": jax.tree.map(lambda _: "backbone", params),
              "classifier": jax.tree.map(lambda _: "classifier", cparams)}
    tx = grouped_optimizer(groups, labels)
    state = ProbeState.create(params, cparams, tx.init({"backbone": params, "classifier": cparams}))

    step_cfg = ProbeStepConfig(
        finetune=bool(cfg.get("finetune", False)),
        task=task,
        num_classes=num_out,
        label_smoothing=cfg.get("label_smoothing", 0.0),
        mixup=cfg.get("mixup", 0.0),
        cutmix=cfg.get("cutmix", 0.0),
    )
    clf_apply = lambda p, f: clf.apply({"params": p}, f)  # noqa: E731
    train_step = jax.jit(make_probe_train_step(feature_fn, clf_apply, tx, step_cfg))
    eval_step = make_probe_eval_step(feature_fn, clf_apply)
    return state, train_step, eval_step


def run_probe(cfg, task="classification"):
    # reference main_linear.py:73 seed_everything(cfg.seed): host RNGs must be
    # seeded before dataset construction (sample_ratio subset draw)
    seed_everything(resolve_seed(cfg))
    model, params = load_backbone_for_eval(cfg)
    bk = cfg.backbone.get("kwargs", {})
    img_channels = cfg.data.get("img_channels", dataset_img_channels(cfg.data.dataset))
    max_channels = (bk.get("max_number_channels", img_channels)
                    if cfg.backbone.name in ("vit_channels", "chada_vit") else img_channels)
    train_loader, val_loader = prepare_data(
        cfg.data.dataset,
        train_path=cfg.data.get("train_path"),
        val_path=cfg.data.get("val_path"),
        batch_size=cfg.optimizer.batch_size,
        max_channels=max_channels,
        num_workers=cfg.data.get("num_workers", 4),
        crop_size=cfg.data.get("augmentations", {}).get("crop_size", 224),
        sample_ratio=cfg.data.get("sample_ratio", 1.0),
        subset_seed=resolve_seed(cfg),
        auto_augment=bool(cfg.get("auto_augment", False)),
    )
    steps_per_epoch = max(len(train_loader), 1)
    state, train_step, eval_step = build_probe(cfg, model, params, steps_per_epoch, task)

    logger = MetricLogger(".", name=f"{cfg.name}_probe_logs.txt")
    rng = jax.random.PRNGKey(resolve_seed(cfg))
    max_steps = cfg.get("max_steps")
    # "reduce" scheduler (reference linear.py:360-361): host-side plateau
    # controller scaling the lr via the step's lr_scale input; monitors the
    # mean train loss per epoch (the reference registers the torch scheduler
    # with no monitor wired — torch defaults apply)
    plateau = (PlateauScale() if cfg.scheduler.get("name") == "reduce" else None)
    lr_scale = 1.0
    done = 0

    # ---- probe checkpoint/auto-resume (the reference wires Checkpointer +
    # AutoResumer into main_linear.py:198-214 / main_regression.py too; ours
    # resumes at epoch granularity, matching Lightning's per-epoch saves).
    # Payload epoch = last COMPLETED epoch; lr_scale rides along so the
    # "reduce" scheduler keeps its scale (its patience counters reset).
    ckptr = None
    start_epoch = 0
    if cfg.checkpoint.enabled:
        from chadavit_tpu.utils.checkpoint import (
            AutoResumer, Checkpointer, restore_pytree)

        resume_path = cfg.get("resume_from_checkpoint")
        run_id = None
        if resume_path is None and cfg.auto_resume.enabled:
            # same <dir>/<method>/ subdir the Checkpointer writes to
            # (utils/checkpoint.py derives `method or "base"`)
            resume_path, run_id = AutoResumer(
                checkpoint_dir=os.path.join(cfg.checkpoint.dir,
                                            cfg.get("method") or "base"),
                max_hours=cfg.auto_resume.get("max_hours", 36),
            ).find_checkpoint(cfg)
        if resume_path:
            payload = restore_pytree(resume_path, {
                "state": state,
                "lr_scale": np.zeros((), np.float32),
                "epoch": np.zeros((), np.int64),
                "done": np.zeros((), np.int64)})
            state = payload["state"]
            lr_scale = float(payload["lr_scale"])
            start_epoch = int(payload["epoch"]) + 1
            done = int(payload["done"])
            print(f"auto-resumed probe from {resume_path} at epoch {start_epoch}")
        ckptr = Checkpointer(cfg, base_dir=cfg.checkpoint.dir,
                             frequency=cfg.checkpoint.frequency,
                             keep_prev=cfg.checkpoint.get("keep_prev", False),
                             run_id=run_id)

    def _ckpt_payload(epoch_completed):
        # 0-d numpy ARRAYS (orbax rejects numpy scalars as restore targets)
        return {"state": jax.device_get(state),
                "lr_scale": np.asarray(lr_scale, np.float32),
                "epoch": np.asarray(epoch_completed, np.int64),
                "done": np.asarray(done, np.int64)}

    # host-memory guard (utils/misc.py::HostMemGuard): a mid-epoch fire saves
    # with epoch-1 so the resumed process redoes the partial epoch
    guard = HostMemGuard(
        cfg.get("host_mem_guard_mb"),
        can_restart=(ckptr is not None and cfg.auto_resume.enabled
                     and jax.process_count() == 1))

    for epoch in range(start_epoch, cfg.max_epochs):
        train_loader.set_epoch(epoch)
        epoch_loss, epoch_n = 0.0, 0
        for batch in train_loader:
            rng, sub = jax.random.split(rng)
            dev = {"images": jnp.asarray(batch["images"]),
                   "channel_counts": jnp.asarray(batch["channel_counts"]),
                   "labels": jnp.asarray(batch["labels"])}
            if plateau is not None:
                dev["lr_scale"] = jnp.asarray(lr_scale, jnp.float32)
            state, metrics = train_step(state, dev, sub)
            done += 1
            if plateau is not None:
                epoch_loss += float(metrics["loss"])
                epoch_n += 1
            if done % cfg.get("log_every", 50) == 0:
                logger.log({k: float(v) for k, v in metrics.items()}, step=done)
                if ckptr:
                    guard.check(
                        lambda: ckptr.save_step(_ckpt_payload(epoch - 1), done),
                        where=f"probe step {done} (epoch {epoch} restarts)")
            if max_steps and done >= max_steps:
                break
        if plateau is not None and epoch_n:
            lr_scale = plateau.step(epoch_loss / epoch_n)
        if ckptr:
            ckptr.save(_ckpt_payload(epoch), epoch)
        if max_steps and done >= max_steps:
            break

    # ---- validation: full metric suite (reference linear.py:577-628) ----
    results = {}
    if val_loader is not None:
        logits_all, targets_all = [], []
        for batch in val_loader:
            logits = eval_step(state.backbone, state.classifier,
                               jnp.asarray(batch["images"]),
                               jnp.asarray(batch["channel_counts"]))
            logits_all.append(np.asarray(logits))
            targets_all.append(np.asarray(batch["labels"]))
        logits_all = np.concatenate(logits_all)
        targets_all = np.concatenate(targets_all)
        if task == "regression":
            from chadavit_tpu.eval.metrics import regression_suite

            results = regression_suite(logits_all[:, 0], targets_all)
        else:
            results = classification_suite(logits_all, targets_all, cfg.data.num_classes)
            cm = confusion_matrix(logits_all.argmax(1), targets_all, cfg.data.num_classes)
            from chadavit_tpu.data.datasets import DATASETS

            names = getattr(DATASETS.get(cfg.data.dataset), "int_to_labels", None)
            class_names = ([names[i] for i in sorted(names)] if names
                           else [str(i) for i in range(cfg.data.num_classes)])
            plot_confusion_matrix(cm, class_names, f"{cfg.name}_confusion_matrix.png")
        print("validation:", {k: round(float(v), 4) for k, v in results.items()})
        logger.log(results, step=done)
    return results


def main(argv=None):
    cfg = parse_linear_cfg(load_cfg(argv, description=__doc__))
    run_probe(cfg, task="classification")


if __name__ == "__main__":
    main()
