"""Collective helpers (reference ``src/utils/misc.py:181-233``).

Under GSPMD (jit + NamedSharding) collectives are implicit — a global-batch sum
is just ``jnp.sum`` — so most code needs nothing here. These helpers exist for
explicit-SPMD (``shard_map``/``pmap``) paths, mirroring the reference API:

- ``gather``: differentiable all-gather; gradients flow back to each shard's
  slice (the reference's autograd ``GatherLayer``, ``misc.py:187-215``, whose
  backward all-reduces grads — ``jax.lax.all_gather(tiled=True)`` with its
  built-in transpose rule gives identical semantics).
- ``concat_all_gather_no_grad``: gather with stopped gradients (``misc.py:218-233``).
"""

from __future__ import annotations

import jax

Array = jax.Array


def gather(x: Array, axis_name: str, axis: int = 0) -> Array:
    """Differentiable all-gather along a mapped axis; concatenates shards on
    ``axis`` (reference ``gather``, ``misc.py:213-215``)."""
    gathered = jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)
    return gathered


def concat_all_gather_no_grad(x: Array, axis_name: str, axis: int = 0) -> Array:
    """All-gather without gradient flow (reference ``misc.py:218-233``)."""
    return jax.lax.stop_gradient(jax.lax.all_gather(x, axis_name, axis=axis, tiled=True))


def global_mean(x: Array, axis_name: str) -> Array:
    """Cross-replica mean of a local mean (sync_dist metric reduction)."""
    return jax.lax.pmean(x, axis_name)


def global_batch_sum(x: Array, axis_name: str) -> Array:
    return jax.lax.psum(x, axis_name)
