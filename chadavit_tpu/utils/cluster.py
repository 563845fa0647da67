"""Clustering / whitening utilities (reference vestigial solo-learn modules
kept importable: ``src/utils/sinkhorn_knopp.py``, ``src/utils/kmeans.py``,
``src/utils/whitening.py``, ``src/utils/spherize.py``) — JAX-native, ready for
SwAV/W-MSE-style methods.

Cross-replica semantics: pass ``axis_name`` inside ``shard_map`` to reproduce
the reference's ``dist.all_reduce`` sums (``sinkhorn_knopp.py:67-80``,
``kmeans.py:29``); under GSPMD-jit global ops are already global."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def sinkhorn_knopp(
    logits: Array,
    num_iters: int = 3,
    epsilon: float = 0.05,
    axis_name: Optional[str] = None,
) -> Array:
    """Sinkhorn-Knopp balanced assignment of samples to prototypes (reference
    ``sinkhorn_knopp.py:26-80``): iteratively normalize the exp-scaled score
    matrix so rows sum to 1/B and columns to 1/K; returns soft assignments."""
    q = jnp.exp(logits / epsilon).T  # (K, B_local)
    k, b_local = q.shape
    b_total = b_local * (jax.lax.axis_size(axis_name) if axis_name else 1)

    total = jnp.sum(q)
    if axis_name:
        total = jax.lax.psum(total, axis_name)
    q = q / total

    def body(_, q):
        rows = jnp.sum(q, axis=1, keepdims=True)
        if axis_name:
            rows = jax.lax.psum(rows, axis_name)
        q = q / rows / k
        cols = jnp.sum(q, axis=0, keepdims=True)
        q = q / cols / b_total
        return q

    q = jax.lax.fori_loop(0, num_iters, body, q)
    q = q * b_total
    return q.T


def kmeans(
    features: Array,
    num_clusters: int,
    num_iters: int = 10,
    rng: Optional[Array] = None,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Lloyd's k-means on (B, D) features (reference ``kmeans.py:29`` — used by
    offline cluster assignments). Returns (centroids (K, D), assignments (B,)).
    Cross-replica sums via psum when ``axis_name`` is set."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, d = features.shape
    idx = jax.random.choice(rng, b, (num_clusters,), replace=False)
    centroids = features[idx]

    def body(_, centroids):
        d2 = (
            jnp.sum(features**2, 1, keepdims=True)
            - 2 * features @ centroids.T
            + jnp.sum(centroids**2, 1)[None]
        )
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=features.dtype)
        sums = onehot.T @ features
        counts = jnp.sum(onehot, axis=0)[:, None]
        if axis_name:
            sums = jax.lax.psum(sums, axis_name)
            counts = jax.lax.psum(counts, axis_name)
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)

    centroids = jax.lax.fori_loop(0, num_iters, body, centroids)
    d2 = (
        jnp.sum(features**2, 1, keepdims=True)
        - 2 * features @ centroids.T
        + jnp.sum(centroids**2, 1)[None]
    )
    return centroids, jnp.argmin(d2, axis=1)


def zca_whitening_matrix(x: Array, eps: float = 1e-5) -> Tuple[Array, Array]:
    """ZCA whitening transform of (B, D) features (reference
    ``whitening.py:29`` Whitening2d / ``spherize.py:9``): returns (W, mean)
    with ``x_white = (x - mean) @ W``."""
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = xc.T @ xc / (x.shape[0] - 1)
    s, u = jnp.linalg.eigh(cov)
    w = u @ jnp.diag(1.0 / jnp.sqrt(s + eps)) @ u.T
    return w, mean


def spherize(x: Array, eps: float = 1e-5) -> Array:
    """ZCA-sphere a feature matrix (reference ``spherize.py:9``)."""
    w, mean = zca_whitening_matrix(x, eps)
    return (x - mean) @ w


def whiten_batch(x: Array, eps: float = 0.0) -> Array:
    """Batch ZCA whitening as a differentiable op (reference ``Whitening2d``,
    ``whitening.py:29`` — W-MSE's whitening layer)."""
    return spherize(x, eps=max(eps, 1e-5))
