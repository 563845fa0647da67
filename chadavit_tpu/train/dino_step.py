"""The DINO pretraining step as ONE pure jit-compiled function.

Replaces the reference's LightningModule plumbing (``BaseMethod.training_step``
+ ``BaseMomentumMethod`` + ``DINO.training_step`` + ``on_after_backward`` +
``on_train_batch_end``, reference ``src/methods/{base,dino}.py``) with a single
``(state, batch) -> (state, metrics)`` function:

- student forward on both global crops batched as one ``(2B, C, H, W)`` pass
  (crop-major, matching ``torch.cat(out["z"])`` ordering, ``dino.py:313``)
- teacher forward (EMA params, stop-gradient) on the same global crops
- DINO loss with EMA centering; the center's global mean is a GSPMD collective
  under the data mesh (reference used ``dist.all_reduce``, ``losses/dino.py:112``)
- per-parameter gradient clipping on the backbone only (``dino.py:249-261``)
- prototype-gradient freeze for the first ``freeze_last_layer`` epochs
  (``dino.py:367-376``)
- optax update (LARS + warmup-cosine), EMA teacher update with cosine tau
  (``base.py:1250-1276``), schedules all indexed by ``state.step``

Fidelity notes:
- Small (local) crops contribute **no** DINO signal in the reference: its
  ``multicrop_forward`` never computes head outputs (``base.py:566-614`` has no
  ``z``), and the returned loss is ``dino_loss`` alone (``dino.py:325``,
  SURVEY §2.4 #9). Forwarding them would waste FLOPs with zero gradient, so
  this step skips them; pass ``num_small_crops=0`` data.
- The online classifier receives no gradient in DINO pretraining for the same
  reason; it is omitted from the pretrain step (metrics-only in the reference).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from chadavit_tpu.losses.dino import dino_loss_and_center, teacher_temp_schedule
from chadavit_tpu.train.schedules import cosine_tau
from chadavit_tpu.train.state import DinoState

Array = jax.Array


class DinoStepConfig(NamedTuple):
    """Static configuration compiled into the step."""

    num_large_crops: int = 2
    student_temp: float = 0.1
    # optional lr schedule mirrored into metrics (LearningRateMonitor analogue)
    base_lr: float = 0.0
    warmup_steps: int = 0
    warmup_start_lr: float = 0.0
    min_lr: float = 0.0
    warmup_teacher_temp: float = 0.04
    teacher_temp: float = 0.07
    warmup_teacher_temp_epochs: int = 0
    center_momentum: float = 0.9
    clip_grad: float = 0.0
    freeze_last_layer: int = 1
    base_tau: float = 0.996
    final_tau: float = 1.0
    total_steps: int = 1
    steps_per_epoch: int = 1
    # micro-batches per optimizer step; schedules/EMA track OPTIMIZER steps
    # (reference guards EMA with global_step > last_step, base.py:1263-1276)
    accumulate: int = 1
    # online classifier on detached features for labeled (non-mixed) pretrain
    # (reference base.py:233,561-563): its CE reaches only the classifier
    # params (features are stop_gradient'ed), so DINO dynamics are unchanged;
    # train_acc1/5 are logged. The EMA pair doubles as the momentum classifier
    # (reference base.py:1034-1039,1068-1075).
    num_classes: int = 0
    momentum_classifier: bool = False


def _clip_backbone_grads(grads_backbone, clip: float):
    """Per-parameter L2 clip (reference ``dino_clip_gradients``, ``dino.py:249-261``)."""

    def one(g):
        norm = jnp.linalg.norm(g)
        coef = clip / (norm + 1e-6)
        return jnp.where(coef < 1.0, g * coef, g)

    return jax.tree.map(one, grads_backbone)


def make_dino_eval_loss(
    backbone_apply: Callable,
    head_apply: Callable,
    cfg: DinoStepConfig,
) -> Callable:
    """SSL validation loss (reference ``ssl_val_loss`` / ``DINO.validation_step``,
    ``dino.py:327-365``): the DINO cross-entropy on held-out crops, computed
    with the CURRENT center/temperature but without updating them."""

    def eval_loss(state: DinoState, batch: Dict[str, Array]) -> Array:
        crops, cc = batch["crops"], batch["channel_counts"]
        nc, b = crops.shape[0], crops.shape[1]
        flat = crops.reshape((nc * b,) + crops.shape[2:])
        cc_rep = jnp.tile(cc, nc)
        opt_step = state.step // cfg.accumulate
        epoch = opt_step // cfg.steps_per_epoch
        teacher_temp = teacher_temp_schedule(
            epoch, cfg.warmup_teacher_temp, cfg.teacher_temp, cfg.warmup_teacher_temp_epochs
        )
        s_z = head_apply(state.student["head"],
                         backbone_apply(state.student["backbone"], flat, cc_rep))
        t_z = head_apply(state.teacher["head"],
                         backbone_apply(state.teacher["backbone"], flat, cc_rep))
        loss, _ = dino_loss_and_center(
            s_z.astype(jnp.float32), t_z.astype(jnp.float32), state.center, teacher_temp,
            student_temp=cfg.student_temp, num_large_crops=cfg.num_large_crops,
            center_momentum=cfg.center_momentum,
        )
        return loss

    return eval_loss


def make_dino_train_step(
    backbone_apply: Callable,
    head_apply: Callable,
    tx: optax.GradientTransformation,
    cfg: DinoStepConfig,
    classifier_apply: Optional[Callable] = None,
) -> Callable[[DinoState, Dict[str, Array]], Tuple[DinoState, Dict[str, Array]]]:
    """Build the jittable train step.

    ``backbone_apply(params, crops, channel_counts) -> (M, D)`` features and
    ``head_apply(params, feats) -> (M, P)`` logits, where ``M = num_crops * B``.

    Batch layout: ``{"crops": (num_large_crops, B, C_max, H, W),
    "channel_counts": (B,)}`` plus ``"labels": (B,)`` when the online
    classifier is enabled (``cfg.num_classes > 0``).
    """

    def _class_metrics(logits: Array, targets: Array, prefix: str) -> Dict[str, Array]:
        # out-of-range targets (mislabeled data or a mis-inferred num_classes)
        # count as invalid rather than clamping into a wrong class
        valid = (targets >= 0) & (targets < logits.shape[-1])
        t = jnp.where(valid, targets, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        per = -jnp.take_along_axis(logp, t[:, None], axis=-1)[:, 0]
        n = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(jnp.where(valid, per, 0.0)) / n
        top_k_max = min(5, logits.shape[-1])
        rank = jnp.sum(logp > jnp.take_along_axis(logp, t[:, None], -1), axis=-1)
        acc1 = jnp.sum(jnp.where(valid, (rank < 1).astype(jnp.float32), 0.0)) / n * 100
        acc5 = jnp.sum(jnp.where(valid, (rank < top_k_max).astype(jnp.float32), 0.0)) / n * 100
        return {f"{prefix}class_loss": loss, f"{prefix}acc1": acc1, f"{prefix}acc5": acc5}

    def train_step(state: DinoState, batch: Dict[str, Array]):
        crops = batch["crops"]
        cc = batch["channel_counts"]
        nc, b = crops.shape[0], crops.shape[1]
        flat = crops.reshape((nc * b,) + crops.shape[2:])
        cc_rep = jnp.tile(cc, nc)

        opt_step = state.step // cfg.accumulate
        epoch = opt_step // cfg.steps_per_epoch
        teacher_temp = teacher_temp_schedule(
            epoch, cfg.warmup_teacher_temp, cfg.teacher_temp, cfg.warmup_teacher_temp_epochs
        )

        # ----- teacher (EMA params, no grad): both global crops in one pass -----
        t_feats = backbone_apply(state.teacher["backbone"], flat, cc_rep)
        t_z = head_apply(state.teacher["head"], t_feats)
        t_z = jax.lax.stop_gradient(t_z)

        use_classifier = cfg.num_classes > 0 and classifier_apply is not None \
            and "labels" in batch

        def loss_fn(student_params):
            s_feats = backbone_apply(student_params["backbone"], flat, cc_rep)
            s_z = head_apply(student_params["head"], s_feats)
            loss, new_center = dino_loss_and_center(
                s_z.astype(jnp.float32),
                t_z.astype(jnp.float32),
                state.center,
                teacher_temp,
                student_temp=cfg.student_temp,
                num_large_crops=cfg.num_large_crops,
                center_momentum=cfg.center_momentum,
            )
            aux = {
                "new_center": new_center,
                "teacher_entropy": -jnp.mean(
                    jnp.sum(
                        jax.nn.softmax((t_z - state.center) / teacher_temp, -1)
                        * jax.nn.log_softmax((t_z - state.center) / teacher_temp, -1),
                        axis=-1,
                    )
                ),
            }
            total = loss
            if use_classifier:
                # classifier CE on DETACHED features: gradients reach only the
                # classifier params; the optimized DINO objective is unchanged
                # (reference returns dino_loss alone, dino.py:325)
                targets_rep = jnp.tile(batch["labels"], nc)
                logits = classifier_apply(student_params["classifier"],
                                          jax.lax.stop_gradient(s_feats))
                cls = _class_metrics(logits, targets_rep, "train_")
                aux["cls_metrics"] = cls
                total = loss + cls["train_class_loss"]
            return total, (loss, aux)

        (_, (loss, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.student)

        # gradient hygiene (reference on_after_backward, dino.py:367-376)
        if cfg.clip_grad:
            grads = dict(grads)
            grads["backbone"] = _clip_backbone_grads(grads["backbone"], cfg.clip_grad)
        if cfg.freeze_last_layer > 0:
            frozen = (epoch < cfg.freeze_last_layer).astype(jnp.float32)
            grads = dict(grads)
            head_grads = dict(grads["head"])
            for k in ("last_layer_v", "last_layer_g"):
                if k in head_grads:
                    head_grads[k] = head_grads[k] * (1.0 - frozen)
            grads["head"] = head_grads

        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)

        # EMA teacher with cosine tau, once per OPTIMIZER step
        # (base.py:1250-1276, momentum.py:73-87)
        tau = cosine_tau(opt_step, cfg.total_steps, cfg.base_tau, cfg.final_tau)
        if cfg.accumulate > 1:
            did_update = (state.step + 1) % cfg.accumulate == 0
            teacher = jax.lax.cond(
                did_update,
                lambda: jax.tree.map(lambda t, s: tau * t + (1.0 - tau) * s,
                                     state.teacher, student),
                lambda: state.teacher,
            )
        else:
            teacher = jax.tree.map(lambda t, s: tau * t + (1.0 - tau) * s,
                                   state.teacher, student)

        new_state = state.replace(
            step=state.step + 1,
            student=student,
            teacher=teacher,
            opt_state=opt_state,
            center=aux["new_center"],
        )
        from chadavit_tpu.train.schedules import warmup_cosine_lr

        metrics = {
            "dino_loss": loss,
            "lr": warmup_cosine_lr(opt_step, cfg.base_lr, cfg.total_steps,
                                   cfg.warmup_steps, cfg.warmup_start_lr, cfg.min_lr),
            "tau": tau,
            "teacher_temp": teacher_temp,
            "teacher_entropy": aux["teacher_entropy"],
            "center_norm": jnp.linalg.norm(aux["new_center"]),
            "epoch": epoch,
        }
        if "cls_metrics" in aux:
            metrics.update(aux["cls_metrics"])
        if use_classifier and cfg.momentum_classifier:
            # momentum (EMA) classifier on teacher features, metrics only
            # (reference base.py:1034-1039,1102-1155)
            m_logits = classifier_apply(state.teacher["classifier"], t_feats)
            metrics.update(_class_metrics(m_logits, jnp.tile(batch["labels"], nc),
                                          "momentum_"))
        return new_state, metrics

    return train_step
