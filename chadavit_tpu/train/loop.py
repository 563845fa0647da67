"""Training loop orchestration: config -> data -> jitted step -> checkpoints.

The TPU-native replacement for Lightning's ``Trainer.fit`` (reference
``main_pretrain.py:290-329``): a plain Python loop around the single jitted
DINO step, with HostLoader prefetching, orbax checkpoints + auto-resume,
offline metric logging, and optional online kNN evaluation."""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from chadavit_tpu.config import Config
from chadavit_tpu.data import (
    FullTransformPipeline,
    HostLoader,
    NCropAugmentation,
    build_transform_pipeline,
    device_prefetch,
    prepare_datasets,
)
from chadavit_tpu.parallel.mesh import make_mesh
from chadavit_tpu.train.pretrain import DinoPretrainSpec, build_dino
from chadavit_tpu.utils.checkpoint import AutoResumer, Checkpointer, restore_pytree
from chadavit_tpu.utils.logging import MetricLogger
from chadavit_tpu.utils.misc import (
    HostMemGuard,
    host_rss_bytes,
    resolve_seed,
    seed_everything,
)
from chadavit_tpu.utils.profiling import StepTimer


def spec_from_cfg(cfg: Config, steps_per_epoch: int) -> DinoPretrainSpec:
    """Map a parsed pretrain config onto the step spec."""
    bk = dict(cfg.backbone.get("kwargs", {}))
    mk = cfg.get("method_kwargs", {})
    opt = cfg.optimizer
    sched = cfg.scheduler
    dtype = jnp.bfloat16 if str(cfg.get("precision", "bf16")).startswith("bf16") else jnp.float32
    return DinoPretrainSpec(
        backbone=cfg.backbone.name,
        backbone_kwargs=bk,
        img_size=cfg.get("augmentations", [{}])[0].get("crop_size", 224) if cfg.get("augmentations") else 224,
        max_channels=bk.get("max_number_channels", cfg.data.get("max_img_channels", 10)),
        proj_hidden_dim=mk.get("proj_hidden_dim", 2048),
        proj_output_dim=mk.get("proj_output_dim", 256),
        num_prototypes=mk.get("num_prototypes", 4096),
        use_bn_in_head=mk.get("use_bn_in_head", False),
        norm_last_layer=mk.get("norm_last_layer", True),
        student_temperature=mk.get("student_temperature", 0.1),
        teacher_temperature=mk.get("teacher_temperature", 0.07),
        warmup_teacher_temperature=mk.get("warmup_teacher_temperature", 0.04),
        warmup_teacher_temperature_epochs=mk.get("warmup_teacher_temperature_epochs", 0),
        clip_grad=mk.get("clip_grad", 0),
        freeze_last_layer=mk.get("freeze_last_layer", 1),
        base_tau=cfg.momentum.base_tau,
        final_tau=cfg.momentum.final_tau,
        optimizer=opt.name,
        lr=opt.lr,
        weight_decay=opt.weight_decay,
        optimizer_kwargs=dict(opt.get("kwargs", {})),
        exclude_bias_n_norm_wd=opt.get("exclude_bias_n_norm_wd", False),
        warmup_epochs=sched.warmup_epochs,
        warmup_start_lr=sched.warmup_start_lr if sched.warmup_epochs > 0 else opt.lr,
        min_lr=sched.min_lr,
        channels_strategy=cfg.get("channels_strategy", "multi_channels"),
        mixed_channels=cfg.get("mixed_channels", True),
        img_channels=cfg.data.get("img_channels", 3),
        # online classifier on detached feats for labeled non-mixed pretrain
        # (reference base.py:233,561-563; disabled under mixed_channels,
        # base.py:640-648)
        num_classes=int(cfg.data.get("num_classes", 0) or 0),
        online_classifier=(not cfg.get("mixed_channels", True)
                           and int(cfg.data.get("num_classes", 0) or 0) > 0),
        momentum_classifier=bool(cfg.get("momentum_classifier", False)),
        classifier_lr=float(opt.get("classifier_lr", 3e-3) or 3e-3),
        num_large_crops=cfg.data.num_large_crops,
        max_epochs=cfg.max_epochs,
        steps_per_epoch=steps_per_epoch,
        accumulate_grad_batches=cfg.get("accumulate_grad_batches", 1) or 1,
        dtype=dtype,
    )


def build_pretrain_loader(cfg: Config, seed: int = 0) -> HostLoader:
    """Multi-crop SSL loader from the config's augmentation pipelines
    (reference ``main_pretrain.py:101-136``).

    With ``device_augmentations: true`` the host only decodes and resizes to
    the base crop size; all random views are generated on-device by the jitted
    multicrop fn (the DALI-equivalent path) and the loader yields single raw
    images instead of host-augmented crops."""
    if cfg.get("device_augmentations", False):
        from chadavit_tpu.data.transforms import RawResize

        base = cfg["augmentations"][0]["crop_size"] if cfg.get("augmentations") else 224
        transform = RawResize(base)
    else:
        pipelines = [
            NCropAugmentation(
                build_transform_pipeline(cfg.data.dataset, aug, seed=seed + i),
                aug.get("num_crops", 1),
            )
            for i, aug in enumerate(cfg.get("augmentations", []))
        ]
        transform = FullTransformPipeline(pipelines)
    if cfg.get("debug_augmentations", False):  # reference main_pretrain.py:120-122
        print("Transforms:")
        print(transform)
    crop = cfg["augmentations"][0]["crop_size"] if cfg.get("augmentations") else 224
    if cfg.data.dataset == "synthetic":
        ds_kwargs = dict(n=cfg.data.get("size", 256), img_size=crop,
                         max_channels=cfg.data.get("max_img_channels", 10))
    elif cfg.data.dataset == "synthetic_structured":
        from chadavit_tpu.data.synthetic import SyntheticStructured

        # in-memory renderer is already raw integer planes; no ``raw`` kwarg
        ds_kwargs = dict(n=cfg.data.get("size", 512), img_size=crop,
                         max_channels=cfg.data.get("max_img_channels", 4),
                         num_classes=cfg.data.get("num_classes",
                                                  SyntheticStructured.NUM_CLASSES))
    elif cfg.get("device_augmentations", False):
        # manifest datasets: keep raw integer planes for the uint8/uint16
        # transfer + on-device normalization path
        ds_kwargs = dict(raw=True)
    else:
        ds_kwargs = {}
    dataset = prepare_datasets(
        cfg.data.dataset,
        transform=transform,
        train_path=cfg.data.get("train_path"),
        train=True,
        sample_ratio=cfg.data.get("sample_ratio", 1.0),
        # local-RNG subset draw: provably the same subset as the canonical
        # random.Random(seed) cache regardless of prior global-RNG consumption
        # (e.g. the host-augmentation pipeline construction above)
        subset_seed=seed,
        **ds_kwargs,
    )
    max_channels = (cfg.backbone.get("kwargs", {}).get("max_number_channels")
                    or cfg.data.get("max_img_channels", 10))
    loader_kwargs = {}
    if cfg.get("device_augmentations", False):
        # RawResize keeps the decoder's dtype: transfer raw integer planes and
        # normalize on device (1-2 bytes/pixel over the host->TPU link)
        probe = np.asarray(dataset[0][0])
        loader_kwargs = dict(channels_last=True, dtype=probe.dtype)
        # disk-manifest datasets: decode whole batches in the C++ threadpool
        # straight into the dense raw layout (no per-plane Python, GIL released
        # for the batch) — the DALI-role production path
        from chadavit_tpu.data import native as _native

        base_size = cfg["augmentations"][0]["crop_size"] if cfg.get("augmentations") else 224
        if (_native.is_available() and hasattr(dataset, "file_list")
                and probe.dtype in (np.uint8, np.uint16)
                and cfg.data.get("native_loader", True)):
            # optional decoded-plane cache: epochs >= 2 are decode-free for
            # datasets that fit the byte cap (data.cache_decoded[_mb])
            cache = (_native.DecodedPlaneCache(
                         int(cfg.data.get("cache_decoded_mb", 2048)) * 2**20)
                     if cfg.data.get("cache_decoded", False) else None)
            loader_kwargs["native_batch_fn"] = _native.make_dense_batch_fn(
                dataset, base_size,
                num_threads=int(cfg.data.get("decode_threads", 4) or 4),
                out_depth=16 if probe.dtype == np.uint16 else 8,
                regression=getattr(dataset, "task", "") == "regression",
                cache=cache)
    # multi-host DP: every process loads a disjoint rank shard of the same
    # deterministic batch order; the loop assembles global arrays per step
    # (parallel/distributed.globalize_batch)
    shard = (jax.process_index(), jax.process_count()) \
        if jax.process_count() > 1 else None
    return HostLoader(
        dataset,
        batch_size=cfg.optimizer.batch_size,
        max_channels=max_channels,
        num_workers=cfg.data.get("num_workers", 4),
        seed=seed,
        # group batches by channel count and pad only to the bucket width:
        # skips padded-channel FFN/LN work (the step recompiles once per width)
        bucket_by_channels=cfg.get("bucket_by_channels", False),
        # exact widths by default: padded-channel work is zero (attention cost
        # scales with the true (1+196c)^2); one compiled shape per width
        bucket_round=int(cfg.get("bucket_round", 1)),
        shard=shard,
        **loader_kwargs,
    )


def run_dino_pretrain(cfg: Config, max_steps: Optional[int] = None) -> Dict:
    """Full DINO pretraining (the ``main_pretrain.py`` engine). Returns final
    metrics. ``max_steps`` truncates for smoke tests."""
    seed = resolve_seed(cfg)
    # seed host RNGs BEFORE dataset construction (reference main_pretrain.py:80
    # seed_everything) — the sample_ratio subset draw (datasets.py) uses the
    # global `random`, so without this a fresh run (no cached list) draws a
    # nondeterministic low-data subset
    seed_everything(seed)
    loader = build_pretrain_loader(cfg, seed=seed)
    steps_per_epoch = max(len(loader), 1)
    spec = spec_from_cfg(cfg, steps_per_epoch)

    # mesh: data parallel over the configured devices (the reference's
    # `devices: [0,2]` key selects accelerator indices), optionally x-way
    # tensor parallel (model_parallel: N; params shard per parallel/mesh.py)
    devices = None
    cfg_devices = cfg.get("devices", None)
    if isinstance(cfg_devices, (list, tuple)):
        all_dev = jax.devices()
        wanted = [int(d) for d in cfg_devices]
        if all(0 <= d < len(all_dev) for d in wanted):
            devices = [all_dev[d] for d in wanted]
        else:
            print(f"devices={cfg_devices} exceeds visible {len(all_dev)}; using all")
    mesh = make_mesh(n_model=int(cfg.get("model_parallel", 1) or 1), devices=devices)
    # with on-device augmentation, compile it INTO the train step (one dispatch
    # per step; raw integer planes go straight into the jitted program)
    fused_augs = ([dict(a) for a in cfg.get("augmentations", [])]
                  if cfg.get("device_augmentations", False) else None)
    state, train_step, model, head = build_dino(
        spec, mesh=mesh, rng=jax.random.PRNGKey(seed),
        device_augmentations=fused_augs,
        # fsdp: true shards params/teacher/opt state over the data axis
        # (ZeRO-3 via GSPMD) — the pod memory recipe for big backbones
        fsdp=bool(cfg.get("fsdp", False)))

    from chadavit_tpu.utils.misc import pretty_param_summary

    # summary reads only leaf SHAPES — never device_get fresh params here
    # (a multi-MB readback straight after init; the tunneled dev TPU has been
    # observed to stall exactly on that transfer)
    print("student parameters (backbone):\n" + pretty_param_summary(
        state.student["backbone"]))
    print("student parameters (head):\n" + pretty_param_summary(
        state.student["head"]))

    # checkpointing + auto-resume (reference main_pretrain.py:211-230);
    # resume is EXACT-step: mid-epoch checkpoints restore into the same batch
    # order (deterministic per-epoch shuffling + step-indexed rng)
    ckptr = None
    start_epoch = 0
    start_step = 0
    if cfg.checkpoint.enabled:
        resume_path = cfg.get("resume_from_checkpoint")
        run_id = None
        if resume_path is None and cfg.auto_resume.enabled:
            resume_path, run_id = AutoResumer(
                checkpoint_dir=os.path.join(cfg.checkpoint.dir, cfg.get("method", "dino")),
                max_hours=cfg.auto_resume.get("max_hours", 36),
            ).find_checkpoint(cfg)
        if resume_path:
            state = restore_pytree(resume_path, state)
            start_step = int(jax.device_get(state.step))
            start_epoch = start_step // steps_per_epoch
            print(f"auto-resumed from {resume_path} at step {start_step} "
                  f"(epoch {start_epoch})")
        ckptr = Checkpointer(cfg, base_dir=cfg.checkpoint.dir,
                             frequency=cfg.checkpoint.frequency,
                             keep_prev=cfg.checkpoint.get("keep_prev", False),
                             run_id=run_id)

    # preemption hook (reference SLURMEnvironment(requeue_signal=SIGUSR1),
    # main_pretrain.py:304-306): SIGTERM/SIGUSR1 -> checkpoint at the current
    # step and exit cleanly; auto-resume picks the run back up exactly there
    import signal
    import threading

    preempted = threading.Event()

    def _on_preempt(*_):
        # first signal: finish the in-flight step, checkpoint, exit cleanly.
        # second signal: force exit (e.g. the first arrived mid-compile and the
        # supervisor's grace period ran out) — still re-startable via resume.
        if preempted.is_set():
            raise SystemExit(143)
        preempted.set()

    if threading.current_thread() is threading.main_thread():
        for _sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(_sig, _on_preempt)
            except (ValueError, OSError):  # pragma: no cover
                pass
    step_ckpt_every = int(cfg.checkpoint.get("step_frequency", 0) or 0) \
        if cfg.checkpoint.enabled else 0

    logger = MetricLogger(ckptr.path if ckptr else ".", stdout_every=cfg.get("log_every", 50))
    timer = StepTimer()

    # ---- optional per-epoch validation: online kNN on student CLS features
    # (reference knn_eval, base.py:282-287,723-731) over a labeled val split ----
    knn_enabled = bool(cfg.get("knn_eval", {}).get("enabled", False))
    umap_enabled = bool(cfg.get("auto_umap", {}).get("enabled", False))
    val_loader = None
    if (knn_enabled or umap_enabled) and (cfg.data.get("val_path")
                                          or cfg.data.dataset == "synthetic"):
        from chadavit_tpu.data.classification import prepare_data

        max_channels = (cfg.backbone.get("kwargs", {}).get("max_number_channels")
                        or cfg.data.get("max_img_channels", 10))
        crop = cfg["augmentations"][0]["crop_size"] if cfg.get("augmentations") else 224
        knn_train_loader, val_loader = prepare_data(
            cfg.data.dataset,
            train_path=cfg.data.get("train_path"),
            val_path=cfg.data.get("val_path"),
            batch_size=cfg.optimizer.batch_size,
            max_channels=max_channels,
            num_workers=cfg.data.get("num_workers", 4),
            crop_size=crop,
            val_transform_for_train=True,
            # C++ batch decode for the val-transform loaders: per-epoch online
            # kNN was measured ~20x slower through the per-plane PIL path
            native_loader=bool(cfg.data.get("native_loader", True)),
            # knn_eval.train_sample_ratio subsamples the kNN feature bank's
            # TRAIN split (cached-list semantics, datasets.py sample_ratio):
            # at 100k-image scale a full-bank extraction re-decodes every
            # plane per eval (~minutes on few-core hosts) for no measurable
            # accuracy gain over a 10-20% bank. Unset, it inherits
            # data.sample_ratio — in the reference the online-kNN bank is fed
            # by the same (already subsampled) train dataset object, so a
            # subsampled pretrain must not silently extract the full split.
            sample_ratio=float(cfg.get("knn_eval", {}).get(
                "train_sample_ratio",
                cfg.data.get("sample_ratio", 1.0)) or 1.0),
            subset_seed=resolve_seed(cfg),
        )

    ssl_val = None
    if cfg.get("ssl_val_loss") and val_loader is not None:
        from chadavit_tpu.train.dino_step import DinoStepConfig, make_dino_eval_loss

        def backbone_apply(p, x, c):
            return model.apply({"params": p}, x.astype(spec.dtype), c)

        def head_apply(p, f):
            return head.apply({"params": p}, f)

        eval_cfg = DinoStepConfig(
            num_large_crops=2, student_temp=spec.student_temperature,
            warmup_teacher_temp=spec.warmup_teacher_temperature,
            teacher_temp=spec.teacher_temperature,
            warmup_teacher_temp_epochs=spec.warmup_teacher_temperature_epochs,
            steps_per_epoch=steps_per_epoch, total_steps=spec.total_steps,
            accumulate=spec.accumulate_grad_batches,
        )
        ssl_val = jax.jit(make_dino_eval_loss(backbone_apply, head_apply, eval_cfg))
        # two INDEPENDENT augmented views per val image (duplicating the same
        # tensor would make the cross-view loss degenerate): reuse the train
        # augmentation recipe's large-crop pipelines on device
        from chadavit_tpu.data.device_augment import make_multicrop_fn as _mk_mc

        _val_augs = [dict(a) for a in cfg.get("augmentations", [])]
        if not _val_augs:
            crop_sz = 224
            _val_augs = [{"crop_size": crop_sz, "num_crops": 2,
                          "rrc": {"enabled": True, "crop_min_scale": 0.3,
                                  "crop_max_scale": 1.0},
                          "horizontal_flip": {"prob": 0.5}}]
        ssl_val_aug = _mk_mc(_val_augs)

    auto_umap = None
    if umap_enabled and val_loader is not None:
        from chadavit_tpu.utils.auto_umap import AutoUMAP

        auto_umap = AutoUMAP(
            out_dir=str(ckptr.path) if ckptr else "auto_umap",
            frequency=int(cfg.get("auto_umap", {}).get("frequency", 1)),
        )

    # online validation cadence (epochs); reference validates every epoch but
    # its val sets are small relative to train throughput — ours is a knob
    val_every = max(int(cfg.get("knn_eval", {}).get("frequency", 1) or 1), 1)

    def validate(epoch: int):
        if val_loader is None or (epoch + 1) % val_every != 0:
            return {}
        from chadavit_tpu.eval.features import extract_features
        from chadavit_tpu.eval.knn import knn_classify

        params = jax.device_get(state.student["backbone"])

        def feature_fn(p, images, counts):
            return model.apply({"params": p}, images.astype(spec.dtype), counts)

        te_f, te_t = extract_features(val_loader, feature_fn, params)
        mask_te = te_t != -1
        out = {}
        if auto_umap is not None and mask_te.any():
            # training-time UMAP of val features (reference AutoUMAP callback)
            path = auto_umap.maybe_plot(epoch, te_f[mask_te], te_t[mask_te],
                                        seed=seed)
            if path:
                print(f"auto-umap: {path}")
        if not knn_enabled:
            return out
        tr_f, tr_t = extract_features(knn_train_loader, feature_fn, params)
        mask_tr = tr_t != -1
        if not mask_tr.any() or not mask_te.any():
            return out
        k = int(cfg.get("knn_eval", {}).get("k", 20))
        top1, top5 = knn_classify(tr_f[mask_tr], tr_t[mask_tr], te_f[mask_te], te_t[mask_te],
                                  k=k, distance_fx=cfg.get("knn_eval", {}).get(
                                      "distance_func", "cosine"))
        out.update({"val_knn_top1": top1, "val_knn_top5": top5})
        if ssl_val is not None:
            losses = []
            vrng = jax.random.PRNGKey(10_000 + epoch)
            for vb in val_loader:
                vrng, sub = jax.random.split(vrng)
                imgs = jnp.asarray(vb["images"], spec.dtype)
                counts = jnp.asarray(vb["channel_counts"])
                views = ssl_val_aug(sub, imgs, counts)
                vbatch = {"crops": views["crops"][:2].astype(spec.dtype),
                          "channel_counts": counts}
                losses.append(float(ssl_val(state, vbatch)))
            out["dino_loss_val"] = float(np.mean(losses))
        logger.log(out, step=int(jax.device_get(state.step)))
        return out

    import ml_dtypes

    def _host_cast(a):
        return a.astype(ml_dtypes.bfloat16) if spec.dtype == jnp.bfloat16 else a

    # step-indexed rng (fold_in, not sequential splits) so an exact-step resume
    # reproduces the augmentation stream of an uninterrupted run
    aug_base = jax.random.PRNGKey(seed + 1)

    metrics = {}
    done = 0
    gstep = start_step  # python-side mirror of state.step (no per-step sync)

    # ---- host-memory guard (production hardening for leaky device clients;
    # rationale + leak measurement in utils/misc.py::HostMemGuard). The
    # skip-free exact-step auto-resume (HostLoader.iter_from + step-indexed
    # rng) makes the guard's restart invisible to training dynamics.
    guard = HostMemGuard(
        cfg.get("host_mem_guard_mb"),
        can_restart=(ckptr is not None and cfg.auto_resume.enabled
                     and jax.process_count() == 1))

    def _upload(batch, g):
        """Host batch -> device batch; runs in the prefetch thread."""
        if fused_augs is not None:
            # raw integer transfer; [0,1] conversion + views + train step
            # all inside ONE jitted program (see build_dino)
            host_batch = {"images": batch["images"],
                          "channel_counts": batch["channel_counts"]}
        else:
            host_batch = {"crops": _host_cast(batch["crops"]),
                          "channel_counts": batch["channel_counts"]}
        if spec.online_classifier and spec.num_classes > 0:
            host_batch["labels"] = np.asarray(batch["labels"]).astype(np.int32)
        if jax.process_count() > 1:
            from chadavit_tpu.parallel.distributed import globalize_batch

            # upload each host's numpy shard directly into the global
            # sharded array — one H2D transfer per step, no host round-trip
            dev_batch = globalize_batch(host_batch, mesh)
        else:
            dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        if fused_augs is not None:
            dev_batch["rng"] = jax.random.fold_in(aug_base, g)
        return dev_batch

    for epoch in range(start_epoch, cfg.max_epochs):
        loader.set_epoch(epoch)
        skip = start_step % steps_per_epoch if epoch == start_epoch else 0

        def _epoch_batches(skip=skip, g0=gstep):
            # upload + rng-fold run in the device_prefetch thread, so batch
            # N+1's host->device transfer overlaps batch N's step (on
            # networked PJRT backends device_put blocks on the wire); the
            # producer's step counter mirrors the consumer's gstep exactly
            # (both advance once per emitted batch). Mid-epoch resume starts
            # the loader AT the skip point — the consumed prefix is neither
            # decoded nor collated (HostLoader.iter_from).
            g = g0
            for batch in loader.iter_from(skip):
                yield _upload(batch, g)
                g += 1

        for dev_batch in device_prefetch(
                _epoch_batches(), depth=int(cfg.get("device_prefetch", 2))):
            state, metrics = train_step(state, dev_batch)
            timer.tick()
            done += 1
            gstep += 1
            if done % cfg.get("log_every", 50) == 0:
                logger.log({**{k: float(v) for k, v in metrics.items()},
                            **timer.summary(cfg.optimizer.batch_size),
                            "host_rss_gb": round(host_rss_bytes() / 2**30, 3)},
                           step=gstep)
                guard.check(
                    lambda: ckptr.save_step(jax.device_get(state), gstep),
                    where=f"step {gstep}")
            if ckptr and step_ckpt_every and gstep % step_ckpt_every == 0:
                ckptr.save_step(jax.device_get(state), gstep)
            if preempted.is_set():
                if ckptr:
                    ckptr.save_step(jax.device_get(state), gstep)
                print(f"preemption signal: checkpointed at step {gstep}, exiting")
                return {k: float(v) for k, v in metrics.items()}
            if max_steps and done >= max_steps:
                if ckptr:
                    ckptr.save(jax.device_get(state), epoch)
                return {k: float(v) for k, v in metrics.items()}
        if ckptr:
            ckptr.save(jax.device_get(state), epoch)
        metrics = {**{k: float(v) for k, v in metrics.items()}, **validate(epoch)}
    return dict(metrics)
