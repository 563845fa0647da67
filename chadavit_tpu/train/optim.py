"""Optimizers as optax transformations, with the reference's param-group rules.

- LARS with trust coefficient, lr clipping, and auto-exclusion of 1-D params
  from scaling/weight-decay (reference ``src/utils/lars.py:112-167``). The
  reference's config parser defaults ``optimizer.kwargs.momentum`` to **0.9**
  for LARS (``src/args/pretrain.py:219-222``), so the canonical pretrain runs
  momentum-SGD on the LARS direction; pass ``momentum=0`` to disable.
- Param groups: the classifier gets its own lr and weight_decay=0
  (reference ``base.py:406-414``); bias/norm (1-D) params may be excluded from
  weight decay (reference ``base.py:425-427``, ``misc.py:425-454``).

Each group is a self-contained optax chain ending in ``scale_by_schedule(-lr)``,
combined with ``optax.multi_transform`` over a label pytree — one optimizer
state, one jitted update, per-group schedules included.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[Any], Any]


class LarsState(NamedTuple):
    count: jnp.ndarray
    momentum: Any


def lars_direction(
    eta: float = 0.001,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    momentum: float = 0.0,
    clip_lr: bool = False,
    exclude_bias_n_norm: bool = True,
    lr_schedule: Optional[Schedule] = None,
) -> optax.GradientTransformation:
    """LARS descent direction (reference update rule, ``lars.py:124-165``);
    the trailing ``-lr`` scaling is applied by the enclosing chain.

    ``clip_lr`` divides the trust ratio by the *current* lr and caps it at 1
    (``lars.py:146-147``), so it needs the group's lr schedule."""

    def init(params):
        mom = jax.tree.map(jnp.zeros_like, params) if momentum != 0.0 else None
        return LarsState(count=jnp.zeros([], jnp.int32), momentum=mom)

    def update(grads, state, params):
        cur_lr = lr_schedule(state.count) if (clip_lr and lr_schedule is not None) else None

        def one(g, p):
            if exclude_bias_n_norm and p.ndim == 1:
                return g
            p_norm = jnp.linalg.norm(p)
            g_norm = jnp.linalg.norm(g)
            trust = eta * p_norm / (g_norm + p_norm * weight_decay + eps)
            if cur_lr is not None:
                trust = jnp.minimum(trust / cur_lr, 1.0)
            nonzero = (p_norm != 0.0) & (g_norm != 0.0)
            return jnp.where(nonzero, (g + weight_decay * p) * trust, g)

        updates = jax.tree.map(one, grads, params)
        new_count = state.count + 1
        if momentum == 0.0:
            return updates, LarsState(count=new_count, momentum=None)
        bufs = jax.tree.map(lambda b, d: momentum * b + d, state.momentum, updates)
        return bufs, LarsState(count=new_count, momentum=bufs)

    return optax.GradientTransformation(init, update)


def wd_mask(params) -> Any:
    """True where weight decay applies (exclude 1-D bias/norm params)."""
    return jax.tree.map(lambda p: p.ndim != 1, params)


def build_group_tx(
    name: str,
    lr_schedule: Schedule,
    weight_decay: float,
    extra_kwargs: Optional[Dict] = None,
    exclude_bias_n_norm_wd: bool = False,
) -> optax.GradientTransformation:
    """One param group's full transformation, mirroring the reference's
    ``_OPTIMIZERS`` registry {sgd, lars, adam, adamw} (``base.py:67-72``) with
    YAML ``optimizer.kwargs`` passed through; the lr schedule is baked in."""
    kw = dict(extra_kwargs or {})
    wd_m = wd_mask if exclude_bias_n_norm_wd else None
    neg_lr = optax.scale_by_schedule(lambda c: -lr_schedule(c))

    if name == "lars":
        return optax.chain(
            lars_direction(
                eta=kw.get("eta", 1e-3),
                eps=kw.get("eps", 1e-8),
                weight_decay=weight_decay,
                momentum=kw.get("momentum", 0.0),
                clip_lr=kw.get("clip_lr", False),
                exclude_bias_n_norm=kw.get("exclude_bias_n_norm", True),
                lr_schedule=lr_schedule,
            ),
            neg_lr,
        )
    if name == "sgd":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay, mask=wd_m))
        if kw.get("momentum", 0.0):
            parts.append(optax.trace(decay=kw["momentum"], nesterov=kw.get("nesterov", False)))
        parts.append(neg_lr)
        return optax.chain(*parts)
    if name in ("adam", "adamw"):
        betas = tuple(kw.get("betas", (0.9, 0.999)))
        parts = []
        if name == "adam" and weight_decay:
            # torch.optim.Adam applies L2-style weight decay: wd*p is added to
            # the gradient BEFORE the Adam moments (unlike AdamW's decoupled
            # decay after them) — reference ``base.py:67-72`` registers plain
            # torch Adam, so configs with optimizer.name: adam must match.
            parts.append(optax.add_decayed_weights(weight_decay, mask=wd_m))
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=kw.get("eps", 1e-8)))
        if name == "adamw" and weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay, mask=wd_m))
        parts.append(neg_lr)
        return optax.chain(*parts)
    raise ValueError(f"unknown optimizer {name!r}; expected sgd/lars/adam/adamw")


def scale_updates_by_path(key_scales: Dict[str, float],
                          default: float = 1.0) -> optax.GradientTransformation:
    """Multiply each update leaf by the scale of the first path segment found in
    ``key_scales`` — the optax expression of per-param-group ``lr_scale``
    (reference layer-wise lr decay, ``misc.py:364-422``: scaling the group's lr
    scales its whole update, weight-decay term included, exactly as torch param
    groups do). Path-based so it works inside ``optax.multi_transform``'s
    masked trees, where a parallel scale pytree would mismatch."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def one(path, u):
            for k in path:
                name = getattr(k, "key", None)
                if name in key_scales:
                    return u * key_scales[name]
            return u * default

        return jax.tree_util.tree_map_with_path(one, updates), state

    return optax.GradientTransformation(init, update)


def grouped_optimizer(
    group_tx: Dict[str, optax.GradientTransformation],
    label_tree: Any,
) -> optax.GradientTransformation:
    """Combine per-group transformations over a label pytree (the optax analogue
    of torch param groups)."""
    return optax.multi_transform(group_tx, label_tree)


def label_params(params: Dict[str, Any], rules: Dict[str, str], default: str = "backbone") -> Any:
    """Label a params dict by top-level key prefix -> group name."""

    def label_subtree(key, subtree):
        lbl = default
        for prefix, group in rules.items():
            if key == prefix or key.startswith(prefix):
                lbl = group
                break
        return jax.tree.map(lambda _: lbl, subtree)

    return {k: label_subtree(k, v) for k, v in params.items()}
