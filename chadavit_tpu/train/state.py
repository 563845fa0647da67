"""Train state pytrees. One pure step function consumes and returns these —
the TPU-native replacement for the reference's LightningModule + callbacks
(``BaseMomentumMethod`` EMA state, DINOLoss center buffer, optimizer/scheduler
state all live here)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


class DinoState(struct.PyTreeNode):
    """DINO pretraining state: student/teacher param pytrees (same structure,
    reference ``momentum.py:27-41``), optimizer state, EMA center
    (``losses/dino.py:59``), and the global step."""

    step: jnp.ndarray
    student: Any  # {'backbone': ..., 'head': ...}
    teacher: Any  # same structure, no gradients
    opt_state: Any
    center: jnp.ndarray  # (1, num_prototypes)

    @classmethod
    def create(cls, student_params, opt_state, num_prototypes: int) -> "DinoState":
        # materialized copy (not aliased — the state is donated through the jitted
        # step, and aliased buffers cannot be donated twice); reference momentum.py:36-40
        teacher = jax.tree.map(lambda x: jnp.array(x, copy=True), student_params)
        return cls(
            step=jnp.zeros([], jnp.int32),
            student=student_params,
            teacher=teacher,
            opt_state=opt_state,
            center=jnp.zeros((1, num_prototypes), jnp.float32),
        )


class ProbeState(struct.PyTreeNode):
    """Linear / regression probe state: backbone (frozen or finetuned) +
    classifier params and optimizer state."""

    step: jnp.ndarray
    backbone: Any
    classifier: Any
    opt_state: Any
    batch_stats: Optional[Any] = None

    @classmethod
    def create(cls, backbone, classifier, opt_state, batch_stats=None) -> "ProbeState":
        return cls(
            step=jnp.zeros([], jnp.int32),
            backbone=backbone,
            classifier=classifier,
            opt_state=opt_state,
            batch_stats=batch_stats,
        )
