"""DINO cross-entropy loss as a pure function (reference ``src/losses/dino.py:27-118``).

Differences from the reference, by TPU design:
- No module state: the EMA ``center`` is part of the train state; the loss
  returns the new center alongside the loss value so the whole step stays pure.
- Cross-replica centering: under a data mesh the global batch-center sum is an
  XLA collective inserted by GSPMD (the reference calls ``dist.all_reduce``,
  ``losses/dino.py:112-114``); inside ``shard_map`` the explicit ``psum`` helper
  below is used.

Semantics preserved:
- student logits chunked by ``num_large_crops``; teacher always chunked in 2
  (reference ``dino.py:82,87`` — SURVEY §2.4 #10).
- same-view pairs skipped (``dino.py:91-98``).
- teacher temperature linear warmup over epochs (``dino.py:62-67``).
- center EMA momentum 0.9 over the *global* teacher batch mean (``dino.py:104-118``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def teacher_temp_schedule(
    epoch: Array,
    warmup_teacher_temp: float,
    teacher_temp: float,
    warmup_teacher_temp_epochs: int,
) -> Array:
    """Linear warmup then constant (reference ``dino.py:62-67``).

    ``np.linspace(a, b, n)[e]`` = ``a + (b - a) * e / (n - 1)`` for ``e < n``.
    """
    e = jnp.asarray(epoch, jnp.float32)
    n = warmup_teacher_temp_epochs
    if n <= 0:
        return jnp.asarray(teacher_temp, jnp.float32)
    if n == 1:
        warm = jnp.asarray(warmup_teacher_temp, jnp.float32)
    else:
        warm = warmup_teacher_temp + (teacher_temp - warmup_teacher_temp) * e / (n - 1)
    return jnp.where(e < n, warm, teacher_temp)


def dino_loss_and_center(
    student_logits: Array,
    teacher_logits: Array,
    center: Array,
    teacher_temp: Array,
    student_temp: float = 0.1,
    num_large_crops: int = 2,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Compute the DINO loss and the updated EMA center.

    Args:
        student_logits: ``(num_student_crops * B, P)`` — all student crop logits
            concatenated along the batch axis (crop-major, like the reference's
            ``torch.cat(out["z"])``).
        teacher_logits: ``(2 * B, P)`` — teacher logits for the two global crops.
        center: ``(1, P)`` current EMA center.
        teacher_temp: scalar temperature for this epoch.
        axis_name: if set, the center update psums across that mapped axis
            (shard_map path); otherwise global semantics come from GSPMD.

    Returns:
        ``(loss, new_center)``.
    """
    student_out = student_logits / student_temp
    student_chunks = jnp.split(student_out, num_large_crops, axis=0)

    teacher_probs = jax.nn.softmax((teacher_logits - center) / teacher_temp, axis=-1)
    teacher_chunks = jnp.split(jax.lax.stop_gradient(teacher_probs), 2, axis=0)

    total = jnp.zeros((), jnp.float32)
    n_terms = 0
    for iq, q in enumerate(teacher_chunks):
        for iv, v in enumerate(student_chunks):
            if iv == iq:
                continue
            logp = jax.nn.log_softmax(v, axis=-1)
            total = total + jnp.mean(jnp.sum(-q * logp, axis=-1))
            n_terms += 1
    loss = total / max(n_terms, 1)

    # ---- EMA center update over the global teacher batch (no grad) ----
    t = jax.lax.stop_gradient(teacher_logits)
    batch_sum = jnp.sum(t, axis=0, keepdims=True)
    local_rows = t.shape[0]
    if axis_name is not None:
        batch_sum = jax.lax.psum(batch_sum, axis_name)
        rows = local_rows * jax.lax.axis_size(axis_name)
    else:
        rows = local_rows
    batch_center = batch_sum / rows
    new_center = center * center_momentum + batch_center * (1.0 - center_momentum)
    return loss, new_center
