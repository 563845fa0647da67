"""Wire backbone + DINO head + optimizer + schedules into a sharded, jitted
train step. This is the programmatic API used by ``main_pretrain.py``, the
benchmark harness, and the multi-chip dry run."""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chadavit_tpu.models import DINOHead, get_backbone
from chadavit_tpu.parallel.mesh import (
    dino_batch_shardings,
    make_mesh,
    param_shardings,
    replicated,
)
from chadavit_tpu.train.dino_step import DinoStepConfig, make_dino_train_step
from chadavit_tpu.train.optim import build_group_tx, grouped_optimizer
from chadavit_tpu.train.schedules import warmup_cosine_lr
from chadavit_tpu.train.state import DinoState


@dataclass
class DinoPretrainSpec:
    """Everything needed to build the DINO pretrain step (mirrors the knobs of
    the reference YAML, ``scripts/knn/bbbc048/dino_chada_vit_moyen.yaml:36-84``)."""

    # backbone
    backbone: str = "vit_channels"
    backbone_kwargs: Dict[str, Any] = field(default_factory=lambda: dict(
        embed_dim=192, patch_size=16, return_all_tokens=False, max_number_channels=10,
    ))
    img_size: int = 224
    max_channels: int = 10
    # channel strategy (reference base.py:508-559): "multi_channels" (ChAdaViT),
    # "one_channel" (plain ViT per channel plane), or None (RGB/fixed channels)
    channels_strategy: Optional[str] = "multi_channels"
    mixed_channels: bool = True
    img_channels: int = 3
    # head (method_kwargs)
    proj_hidden_dim: int = 2048
    proj_output_dim: int = 256
    num_prototypes: int = 4096
    use_bn_in_head: bool = False
    norm_last_layer: bool = True
    # loss / schedules
    student_temperature: float = 0.1
    teacher_temperature: float = 0.07
    warmup_teacher_temperature: float = 0.04
    warmup_teacher_temperature_epochs: int = 0
    clip_grad: float = 0.0
    freeze_last_layer: int = 1
    base_tau: float = 0.9995
    final_tau: float = 1.0
    # optimizer (lr already scaled by batch*devices*nodes/256 at config parse)
    optimizer: str = "lars"
    lr: float = 0.3
    weight_decay: float = 1e-6
    # momentum=0.9 is the reference parse_cfg default for LARS
    # (src/args/pretrain.py:219-222); the canonical benched optimizer carries it
    optimizer_kwargs: Dict[str, Any] = field(default_factory=lambda: dict(
        clip_lr=True, eta=0.02, exclude_bias_n_norm=True, momentum=0.9,
    ))
    exclude_bias_n_norm_wd: bool = False
    warmup_epochs: float = 10
    warmup_start_lr: float = 3e-5
    min_lr: float = 0.0
    # online classifier on detached features for labeled non-mixed pretrain
    # (reference base.py:233,561-563; momentum pair base.py:1034-1039)
    num_classes: int = 0
    online_classifier: bool = False
    momentum_classifier: bool = False
    classifier_lr: float = 3e-3
    # loop sizes
    num_large_crops: int = 2
    max_epochs: int = 400
    steps_per_epoch: int = 100
    # micro-batching: optimizer steps every N batches with summed grads
    # (reference accumulate_grad_batches, base.py:237,258-272)
    accumulate_grad_batches: int = 1
    # numerics
    dtype: Any = jnp.float32

    @property
    def total_steps(self) -> int:
        return self.max_epochs * self.steps_per_epoch


def build_dino(
    spec: DinoPretrainSpec,
    mesh=None,
    rng: Optional[jax.Array] = None,
    device_augmentations=None,
    fsdp: bool = False,
) -> Tuple[DinoState, Callable, Any, Any]:
    """Returns ``(state, jitted_train_step, backbone_model, head_model)``.

    The step is jitted over ``mesh`` with the batch sharded on the data axis and
    params sharded per the TP rules (replicated when the model axis is 1).

    ``fsdp=True`` shards params, teacher and optimizer state over the DATA
    axis too (ZeRO-3; see ``parallel.mesh.param_shardings``) — the memory
    recipe for big backbones on pods. Forces the unfused layer path (the
    Pallas whole-layer custom call needs whole weights, same as under TP).

    With ``device_augmentations`` (the augmentation pipeline list), the
    on-device multicrop augmentation is compiled INTO the train step — one
    dispatch per step instead of two (aug + step), letting XLA overlap the
    augmentation with the first layer's weights prefetch. The returned step
    then takes ``(state, {"images": raw uint8/uint16 (B, C, H, W),
    "channel_counts", "rng": PRNGKey[, "labels"]})``."""
    if mesh is None:
        mesh = make_mesh(n_model=1)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    bk = dict(spec.backbone_kwargs)
    bk.setdefault("img_size", spec.img_size)
    bk["dtype"] = spec.dtype
    from chadavit_tpu.parallel.mesh import MODEL_AXIS

    if mesh is not None and (dict(mesh.shape).get(MODEL_AXIS, 1) > 1 or fsdp):
        # under tensor parallelism / FSDP the per-layer weights are sharded;
        # the fused whole-layer kernel needs them whole (GSPMD cannot
        # partition the custom call), so force the unfused path even if the
        # config asked for it explicitly ("auto"/"fused" would otherwise
        # trigger per-layer weight all-gathers or a compile failure)
        if bk.get("block_impl") == "fused":
            raise ValueError(
                "block_impl='fused' is incompatible with model_parallel>1 / "
                "fsdp: the fused layer kernel cannot be partitioned by GSPMD. "
                "Use block_impl='xla' (or 'auto', which falls back).")
        bk["block_impl"] = "xla"
    is_chada = spec.backbone in ("vit_channels", "chada_vit")
    if is_chada and mesh.size > 1:
        # Pallas paths on a multi-device mesh must run under shard_map (GSPMD
        # cannot partition a pallas_call): batch shards over the data axis,
        # attention heads over the model axis (ops/attention.py
        # prefix_flash_attention_sharded). Heads must divide the model axis;
        # otherwise attention falls back to the (GSPMD-partitionable) XLA path.
        n_model = dict(mesh.shape).get(MODEL_AXIS, 1)
        if bk.get("num_heads", 2) % n_model == 0:
            bk["shard_mesh"] = mesh
        elif bk.get("attn_impl", "auto") != "xla":
            bk["attn_impl"] = "xla"
    if not is_chada:
        bk.pop("return_all_tokens", None)
        bk.pop("max_number_channels", None)
        bk.setdefault("in_chans", 1 if spec.channels_strategy == "one_channel"
                      else spec.img_channels)
    model = get_backbone(spec.backbone, **bk)

    from chadavit_tpu.eval.features import features_dim as _features_dim, make_feature_fn

    embed_dim = bk.get("embed_dim", getattr(model, "embed_dim", 192))
    features_dim = _features_dim(
        spec.channels_strategy if not spec.mixed_channels or not is_chada else None,
        embed_dim, getattr(model, "num_patches", 196),
        spec.img_channels,
        bk.get("return_all_tokens", False),
    ) if not is_chada else embed_dim

    head = DINOHead(
        in_dim=features_dim,
        num_prototypes=spec.num_prototypes,
        use_bn=spec.use_bn_in_head,
        norm_last_layer=spec.norm_last_layer,
        hidden_dim=spec.proj_hidden_dim,
        bottleneck_dim=spec.proj_output_dim,
        dtype=spec.dtype,
    )

    use_classifier = spec.online_classifier and spec.num_classes > 0
    clf = None
    if use_classifier:
        from flax import linen as fnn

        clf = fnn.Dense(spec.num_classes, dtype=spec.dtype)

    # init on the HOST CPU backend: param init + optimizer-state init are
    # ~175 tiny eager dispatches; on a remote/tunneled TPU each costs an RPC
    # round trip (measured: 100 s of build time at ~0.57 s each). On CPU they
    # are microseconds, and the single sharded device_put below moves the
    # finished state to the mesh in one transfer.
    _cpu = jax.devices("cpu")[0]
    with jax.default_device(_cpu):
        r1, r2 = jax.random.split(jax.device_put(rng, _cpu))
        if is_chada:
            dummy = jnp.zeros((1, spec.max_channels, spec.img_size, spec.img_size), spec.dtype)
            backbone_params = model.init(r1, dummy, jnp.ones((1,), jnp.int32))["params"]
        else:
            c_in = bk.get("in_chans", 1)
            dummy = jnp.zeros((1, c_in, spec.img_size, spec.img_size), spec.dtype)
            backbone_params = model.init(r1, dummy)["params"]
        head_params = head.init(r2, jnp.zeros((1, features_dim), spec.dtype))["params"]
        student = {"backbone": backbone_params, "head": head_params}
        if use_classifier:
            student["classifier"] = clf.init(
                jax.random.fold_in(rng, 2), jnp.zeros((1, features_dim), spec.dtype))["params"]

    lr_schedule = functools.partial(
        warmup_cosine_lr,
        base_lr=spec.lr,
        total_steps=spec.total_steps,
        warmup_steps=int(spec.warmup_epochs * spec.steps_per_epoch),
        warmup_start_lr=spec.warmup_start_lr,
        min_lr=spec.min_lr,
    )
    group = build_group_tx(
        spec.optimizer,
        lr_schedule,
        spec.weight_decay,
        spec.optimizer_kwargs,
        spec.exclude_bias_n_norm_wd,
    )
    groups = {"all": group}
    labels = jax.tree.map(lambda _: "all", student)
    if use_classifier:
        # classifier param group: own (pre-scaled) lr, weight decay 0
        # (reference base.py:406-414)
        clf_schedule = functools.partial(
            warmup_cosine_lr,
            base_lr=spec.classifier_lr,
            total_steps=spec.total_steps,
            warmup_steps=int(spec.warmup_epochs * spec.steps_per_epoch),
            warmup_start_lr=min(spec.warmup_start_lr, spec.classifier_lr),
            min_lr=spec.min_lr,
        )
        groups["classifier"] = build_group_tx(
            spec.optimizer, clf_schedule, 0.0, spec.optimizer_kwargs)
        labels = dict(labels)
        labels["classifier"] = jax.tree.map(lambda _: "classifier",
                                            student["classifier"])
    tx = grouped_optimizer(groups, labels)
    if spec.accumulate_grad_batches > 1:
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=spec.accumulate_grad_batches)
    with jax.default_device(_cpu):
        opt_state = tx.init(student)
        state = DinoState.create(student, opt_state, spec.num_prototypes)

    step_cfg = DinoStepConfig(
        num_large_crops=spec.num_large_crops,
        student_temp=spec.student_temperature,
        warmup_teacher_temp=spec.warmup_teacher_temperature,
        teacher_temp=spec.teacher_temperature,
        warmup_teacher_temp_epochs=spec.warmup_teacher_temperature_epochs,
        clip_grad=spec.clip_grad,
        freeze_last_layer=spec.freeze_last_layer,
        base_tau=spec.base_tau,
        final_tau=spec.final_tau,
        total_steps=spec.total_steps,
        steps_per_epoch=spec.steps_per_epoch,
        accumulate=spec.accumulate_grad_batches,
        base_lr=spec.lr,
        warmup_steps=int(spec.warmup_epochs * spec.steps_per_epoch),
        warmup_start_lr=spec.warmup_start_lr,
        min_lr=spec.min_lr,
        num_classes=spec.num_classes if use_classifier else 0,
        momentum_classifier=spec.momentum_classifier,
    )

    if is_chada:
        def backbone_apply(params, x, cc):
            return model.apply({"params": params}, x, cc)
    else:
        backbone_apply = make_feature_fn(
            model, spec.channels_strategy,
            return_all_tokens=False,
            mixed_channels=spec.mixed_channels,
            img_channels=spec.img_channels,
        )

    def head_apply(params, feats):
        return head.apply({"params": params}, feats)

    classifier_apply = None
    if use_classifier:
        def classifier_apply(params, feats):  # noqa: E306
            return clf.apply({"params": params}, feats)

    raw_step = make_dino_train_step(backbone_apply, head_apply, tx, step_cfg,
                                    classifier_apply=classifier_apply)

    # ---- sharding: params per TP/FSDP rules, batch over the data axis ----
    rep = replicated(mesh)
    student_sh = param_shardings(student, mesh, fsdp=fsdp)
    from chadavit_tpu.parallel.mesh import opt_state_shardings

    opt_sh = opt_state_shardings(opt_state, mesh, fsdp=fsdp)
    state_sh = DinoState(step=rep, student=student_sh, teacher=student_sh,
                         opt_state=opt_sh, center=rep)
    batch_sh = dino_batch_shardings(mesh)
    if use_classifier:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from chadavit_tpu.parallel.mesh import DATA_AXIS

        batch_sh = dict(batch_sh, labels=NamedSharding(mesh, P(DATA_AXIS)))
    metric_sh = rep

    state = jax.device_put(state, state_sh)
    if device_augmentations is not None:
        from chadavit_tpu.data.device_augment import make_multicrop_fn

        aug_fn = make_multicrop_fn([dict(a) for a in device_augmentations],
                                   dtype=spec.dtype)

        def fused_raw(st, batch):
            out = aug_fn(batch["rng"], batch["images"], batch["channel_counts"])
            dev = {"crops": out["crops"].astype(spec.dtype),
                   "channel_counts": out["channel_counts"]}
            if "labels" in batch:
                dev["labels"] = batch["labels"]
            return raw_step(st, dev)

        from jax.sharding import NamedSharding, PartitionSpec as P

        from chadavit_tpu.parallel.mesh import DATA_AXIS

        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        fused_batch_sh = {"images": data_sh, "channel_counts": data_sh,
                          "rng": rep}
        if use_classifier:
            fused_batch_sh["labels"] = data_sh
        train_step = jax.jit(
            fused_raw,
            in_shardings=(state_sh, fused_batch_sh),
            out_shardings=(state_sh, None),
            donate_argnums=(0,),
        )
        return state, train_step, model, head

    train_step = jax.jit(
        raw_step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    return state, train_step, model, head


def synthetic_dino_batch(spec: DinoPretrainSpec, batch_size: int, seed: int = 0):
    """Random mixed-channel batch in the train-step layout (for tests/benchmarks)."""
    rng = np.random.default_rng(seed)
    crops = rng.standard_normal(
        (spec.num_large_crops, batch_size, spec.max_channels, spec.img_size, spec.img_size)
    ).astype(np.float32)
    counts = rng.integers(1, spec.max_channels + 1, size=(batch_size,)).astype(np.int32)
    # zero out padded channels like a real collate would
    for i, c in enumerate(counts):
        crops[:, i, c:] = 0.0
    batch = {"crops": jnp.asarray(crops, spec.dtype), "channel_counts": jnp.asarray(counts)}
    if spec.online_classifier and spec.num_classes > 0:
        batch["labels"] = jnp.asarray(
            rng.integers(0, spec.num_classes, size=(batch_size,)).astype(np.int32))
    return batch
