"""Device mesh + sharding rules (the TPU-native replacement for the reference's
Lightning DDP / NCCL layer, reference ``main_pretrain.py:301-309``).

Design (SURVEY §5 "distributed backend"): a 2-D ``Mesh(("data", "model"))``.
The batch shards over ``data`` (pure DP — the only strategy the reference has);
large backbones/heads can additionally shard their FFN/projection matrices over
``model`` (tensor parallel). Everything runs through GSPMD: annotate shardings,
jit once, let XLA insert the collectives over ICI.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: tuple = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Create a ``(data, model)`` mesh over all (or given) devices; ``n_model=1``
    degenerates to pure data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
    arr = np.array(devices).reshape(n // n_model, n_model)
    return Mesh(arr, axis_names)


# (regex over param path, PartitionSpec) — first match wins; default replicated.
# TP rules shard the big matmuls: FFN in/out, packed QKV/out projections, DINO
# head MLP and prototype matrix. 1-D params and tokens stay replicated.
TP_RULES = (
    (r".*linear1/kernel$", P(None, MODEL_AXIS)),
    (r".*linear2/kernel$", P(MODEL_AXIS, None)),
    (r".*fc1/kernel$", P(None, MODEL_AXIS)),
    (r".*fc2/kernel$", P(MODEL_AXIS, None)),
    (r".*in_proj_kernel$", P(None, MODEL_AXIS)),
    (r".*out_proj_kernel$", P(MODEL_AXIS, None)),
    (r".*qkv/kernel$", P(None, MODEL_AXIS)),
    (r".*proj/kernel$", P(MODEL_AXIS, None)),
    (r".*mlp_0/kernel$", P(None, MODEL_AXIS)),
    (r".*mlp_1/kernel$", P(MODEL_AXIS, None)),
    (r".*last_layer_v$", P(None, MODEL_AXIS)),
)


# FSDP (ZeRO-3 style): leaves smaller than this stay replicated — sharding
# tiny biases/norm scales buys no memory and costs an all-gather each.
FSDP_MIN_LEAF_ELEMS = 4096


def _add_fsdp_axis(spec: P, shape, data_size: int) -> P:
    """Extend ``spec`` with ``DATA_AXIS`` on the largest still-unsharded,
    divisible dim (ZeRO parameter sharding over the data axis). Returns the
    original spec when no dim qualifies."""
    dims = list(spec) + [None] * (len(shape) - len(spec))
    best, best_len = None, 0
    for i, (axis, d) in enumerate(zip(dims, shape)):
        if axis is None and d % data_size == 0 and d > best_len:
            best, best_len = i, d
    if best is None:
        return spec
    dims[best] = DATA_AXIS
    return P(*dims)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params: Any, mesh: Mesh, rules=TP_RULES, fsdp: bool = False) -> Any:
    """Pytree of NamedShardings for a param tree: TP rules when the mesh has a
    nontrivial model axis, replicated otherwise.

    ``fsdp=True`` additionally shards every large leaf over the DATA axis
    (ZeRO-3: params, teacher and optimizer state all live sharded; GSPMD
    inserts the per-layer all-gather on use and reduce-scatter on the grad).
    Composes with TP: the TP rule claims its dim first, FSDP takes the largest
    remaining divisible dim. This is the rebuild's memory story for big
    backbones — the reference (DDP, reference main_pretrain.py:301-309) has no
    equivalent and replicates everything per GPU."""
    use_tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    data_size = mesh.shape.get(DATA_AXIS, 1)
    use_fsdp = fsdp and data_size > 1

    def one(path, leaf):
        spec = P()
        if use_tp:
            s = _path_str(path)
            for pat, ps in rules:
                if re.match(pat, s):
                    # only shard if divisible
                    ok = True
                    for dim, axis in enumerate(ps):
                        if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                            ok = False
                    if ok:
                        spec = ps
                    break
        if use_fsdp and np.prod(leaf.shape, dtype=np.int64) >= FSDP_MIN_LEAF_ELEMS:
            spec = _add_fsdp_axis(spec, leaf.shape, data_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, batch_dims: dict) -> dict:
    """Shardings for a batch dict: each entry names which dim is the batch dim."""
    out = {}
    for k, bdim in batch_dims.items():
        spec = [None] * (bdim + 1)
        spec[bdim] = DATA_AXIS
        out[k] = NamedSharding(mesh, P(*spec))
    return out


def dino_batch_shardings(mesh: Mesh) -> dict:
    """crops (num_crops, B, C, H, W) shard dim 1; channel_counts (B,) dim 0."""
    return {
        "crops": NamedSharding(mesh, P(None, DATA_AXIS)),
        "channel_counts": NamedSharding(mesh, P(DATA_AXIS)),
    }


def opt_state_shardings(opt_state: Any, mesh: Mesh, rules=TP_RULES,
                        fsdp: bool = False) -> Any:
    """Shardings for an optax state pytree under TP/FSDP.

    Optimizer buffers that mirror params (LARS/SGD momentum, Adam mu/nu,
    MultiSteps grad accumulators) live at tree paths that END with the param's
    own path (e.g. ``.../momentum/backbone/blocks_0/linear1/kernel``), so the
    same regex TP rules apply leaf-by-leaf; scalar counters match no rule and
    stay replicated. FSDP dim choice depends only on the leaf shape, so a
    mirror buffer always gets its param's sharding. This is what makes TP/FSDP
    actually save optimizer memory."""
    return param_shardings(opt_state, mesh, rules, fsdp=fsdp)


def shard_dino_state(state, mesh: Mesh, fsdp: bool = False):
    """Shardings pytree for a DinoState: params per TP/FSDP rules,
    scalars/center replicated, optimizer state mirroring the param
    shardings."""
    from chadavit_tpu.train.state import DinoState  # local to avoid cycles

    assert isinstance(state, DinoState)
    rep = replicated(mesh)
    student_sh = param_shardings(state.student, mesh, fsdp=fsdp)
    return DinoState(
        step=rep,
        student=student_sh,
        teacher=student_sh,
        opt_state=opt_state_shardings(state.opt_state, mesh, fsdp=fsdp),
        center=rep,
    )
