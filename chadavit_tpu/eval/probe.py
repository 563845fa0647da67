"""Linear / regression probes as jitted train+eval steps (reference
``src/methods/linear.py`` and ``src/methods/regression.py``).

- frozen mode: backbone features under ``stop_gradient``, only the classifier
  trains (reference ``linear.py:386,525`` — backbone kept in eval mode);
- finetune mode: gradients flow into the backbone, optionally with layer-wise
  lr decay (reference ``linear.py:290-303``) expressed as per-layer scale
  factors folded into the update;
- losses: cross-entropy with label smoothing (reference ``main_linear.py:131-150``)
  or soft-target CE under mixup/cutmix; MSE for regression
  (``main_regression.py:108``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from chadavit_tpu.train.state import ProbeState

Array = jax.Array


def cross_entropy(logits: Array, targets: Array, label_smoothing: float = 0.0,
                  num_classes: Optional[int] = None) -> Array:
    """CE over int targets (ignore_index=-1 semantics, reference base.py hot path)
    or soft targets when ``targets`` is 2-D (mixup)."""
    if targets.ndim == 2:
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.sum(targets * logp, -1))
    nc = num_classes or logits.shape[-1]
    valid = targets >= 0
    t = jnp.where(valid, targets, 0)
    onehot = jax.nn.one_hot(t, nc)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / nc
    logp = jax.nn.log_softmax(logits, -1)
    per = -jnp.sum(onehot * logp, -1)
    per = jnp.where(valid, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)


def mixup_cutmix(rng: Array, images: Array, targets: Array, num_classes: int,
                 mixup_alpha: float = 0.0, cutmix_alpha: float = 0.0) -> Tuple[Array, Array]:
    """Batch mixup/cutmix producing soft targets (reference uses timm's Mixup,
    ``main_linear.py:140-150``). images: (B, C, H, W)."""
    b = images.shape[0]
    onehot = jax.nn.one_hot(targets, num_classes)
    r_perm, r_lam, r_choice, r_box = jax.random.split(rng, 4)
    perm = jax.random.permutation(r_perm, b)
    use_cutmix = jnp.logical_and(
        cutmix_alpha > 0,
        jnp.logical_or(mixup_alpha <= 0, jax.random.bernoulli(r_choice, 0.5)),
    )
    alpha = jnp.where(use_cutmix, max(cutmix_alpha, 1e-8), max(mixup_alpha, 1e-8))
    lam = jax.random.beta(r_lam, alpha, alpha)

    mixed = lam * images + (1 - lam) * images[perm]

    h, w = images.shape[-2:]
    cut = jnp.sqrt(1 - lam)
    ch, cw = (cut * h).astype(jnp.int32), (cut * w).astype(jnp.int32)
    cy = jax.random.randint(r_box, (), 0, h)
    cx = jax.random.randint(r_box, (), 0, w)
    y0, y1 = jnp.clip(cy - ch // 2, 0, h), jnp.clip(cy + ch // 2, 0, h)
    x0, x1 = jnp.clip(cx - cw // 2, 0, w), jnp.clip(cx + cw // 2, 0, w)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, None]
    cutmixed = jnp.where(box, images[perm], images)
    lam_cut = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

    images_out = jnp.where(use_cutmix, cutmixed, mixed)
    lam_out = jnp.where(use_cutmix, lam_cut, lam)
    targets_out = lam_out * onehot + (1 - lam_out) * onehot[perm]
    return images_out, targets_out


class ProbeStepConfig(NamedTuple):
    finetune: bool = False
    task: str = "classification"  # or "regression"
    num_classes: int = 2
    label_smoothing: float = 0.0
    mixup: float = 0.0
    cutmix: float = 0.0


def make_probe_train_step(
    feature_fn: Callable,  # (backbone_params, images, counts) -> (B, F)
    classifier_apply: Callable,  # (classifier_params, feats) -> (B, num_out)
    tx: optax.GradientTransformation,
    cfg: ProbeStepConfig,
) -> Callable:
    """(state, batch, rng) -> (state, metrics). batch: images/channel_counts/labels."""

    def step(state: ProbeState, batch: Dict[str, Array], rng: Array):
        images, counts, targets = batch["images"], batch["channel_counts"], batch["labels"]

        if cfg.task == "classification" and (cfg.mixup > 0 or cfg.cutmix > 0):
            images, targets = mixup_cutmix(rng, images, targets, cfg.num_classes,
                                           cfg.mixup, cfg.cutmix)

        def loss_fn(params):
            backbone, classifier = params["backbone"], params["classifier"]
            if not cfg.finetune:
                backbone = jax.lax.stop_gradient(backbone)
            feats = feature_fn(backbone, images, counts)
            if not cfg.finetune:
                feats = jax.lax.stop_gradient(feats)
            logits = classifier_apply(classifier, feats)
            if cfg.task == "regression":
                loss = jnp.mean((logits[:, 0] - targets.astype(logits.dtype)) ** 2)
            else:
                loss = cross_entropy(logits, targets, cfg.label_smoothing, cfg.num_classes)
            return loss, logits

        params = {"backbone": state.backbone, "classifier": state.classifier}
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        if "lr_scale" in batch:
            # host-driven lr multiplier (ReduceLROnPlateau, schedules.PlateauScale):
            # optax chains end in scale_by_learning_rate, so scaling the final
            # update equals scaling the lr
            updates = jax.tree.map(lambda u: u * batch["lr_scale"], updates)
        new_params = optax.apply_updates(params, updates)
        new_state = state.replace(
            step=state.step + 1,
            backbone=new_params["backbone"],
            classifier=new_params["classifier"],
            opt_state=opt_state,
        )
        metrics = {"loss": loss}
        if cfg.task == "classification" and targets.ndim == 1:
            metrics["acc1"] = jnp.mean((jnp.argmax(logits, -1) == targets).astype(jnp.float32)) * 100
        return new_state, metrics

    return step


def make_probe_eval_step(feature_fn: Callable, classifier_apply: Callable) -> Callable:
    @jax.jit
    def step(backbone_params, classifier_params, images, counts):
        feats = feature_fn(backbone_params, images, counts)
        return classifier_apply(classifier_params, feats)

    return step


def layer_decay_scales(params: Dict[str, Any], layer_decay: float, depth: int) -> Dict[str, float]:
    """Per-top-level-key lr scale factors for layer-wise lr decay (reference
    ``misc.py:364-422`` via timm): embeddings get decay^(depth+1), block i gets
    decay^(depth-i), the final norm gets 1."""
    scales = {}
    for key in params:
        if key.startswith("blocks_"):
            i = int(key.split("_")[1])
            scales[key] = layer_decay ** (depth - i)
        elif key in ("cls_token", "pos_embed", "channel_token", "patch_embed",
                     "patch_kernel", "patch_bias"):
            scales[key] = layer_decay ** (depth + 1)
        else:
            scales[key] = 1.0
    return scales
