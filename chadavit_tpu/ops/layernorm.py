"""Fused LayerNorm (+ optional residual add) as a Pallas TPU kernel with a
custom VJP.

Why: the reference's post-norm encoder layer applies LayerNorm THREE times per
block (the double-norm1 quirk + norm2, reference ``chada_vit.py:96-100``), and
XLA's lowering of those 37 applications (12 blocks x 3 + final) was measured
at ~47 ms/step at the canonical config — ~10x off HBM bandwidth, dominated by
convert/multiply-reduce fusion passes. This kernel does one read + one write
per application (stats in f32 registers), and folds the preceding residual add
in (``y = LN(x + r)``), whose backward is the identity to both addends.

Numerics: the residual add happens in the INPUT dtype (matching ``x + attn``
in bf16 before flax's LayerNorm upcast), stats and normalization in float32,
output cast back — the same contract as ``flax.linen.LayerNorm`` with
``use_fast_variance`` (E[x^2] - E[x]^2).

Layout: input reshaped to (M, D) and processed in (ROWS_PER_STEP, D) blocks —
big blocks, tiny grids (grid-step overhead on v5e is ~2us; see
flash_attention.py). mu/rstd are saved as (M, LANES) row tensors for the
backward; dgamma/dbeta come out as per-block partials summed in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 8
ROWS_PER_STEP = 2048


def _ln_fwd_kernel(x_ref, r_ref, g_ref, b_ref, y_ref, mu_ref, rstd_ref,
                   *, eps: float, has_residual: bool):
    x = x_ref[0]
    if has_residual:
        x = x + r_ref[0]  # input-dtype add (matches the model's bf16 residual)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    # max(0, .) clamp matches flax's fast-variance path
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    y = xhat * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    mu_ref[0] = jnp.broadcast_to(mu, (x.shape[0], LANES))
    rstd_ref[0] = jnp.broadcast_to(rstd, (x.shape[0], LANES))


def _ln_bwd_kernel(x_ref, r_ref, g_ref, mu_ref, rstd_ref, dy_ref,
                   dx_ref, dg_ref, db_ref, *, has_residual: bool):
    x = x_ref[0]
    if has_residual:
        x = x + r_ref[0]
    xf = x.astype(jnp.float32)
    mu = mu_ref[0][:, 0:1]
    rstd = rstd_ref[0][:, 0:1]
    xhat = (xf - mu) * rstd
    dy = dy_ref[0].astype(jnp.float32)
    gamma = g_ref[0].astype(jnp.float32)

    dxhat = dy * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    # (8, D) broadcast rows (a (1, D) block of a (n_blocks, D) array is not a
    # legal Mosaic tile); the caller sums ALL rows and divides by 8
    dg_ref[0] = jnp.broadcast_to(jnp.sum(dy * xhat, axis=0, keepdims=True), (8, dy.shape[1]))
    db_ref[0] = jnp.broadcast_to(jnp.sum(dy, axis=0, keepdims=True), (8, dy.shape[1]))


def _pad_rows(x2: Array, m_pad: int) -> Array:
    m = x2.shape[0]
    return x2 if m == m_pad else jnp.pad(x2, ((0, m_pad - m), (0, 0)))


def _row_spec(bm: int, d: int):
    return pl.BlockSpec((1, bm, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _vec_spec(d: int):
    return pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _stat_spec(bm: int):
    return pl.BlockSpec((1, bm, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _ln_fwd_impl(x, residual, gamma, beta, eps, interpret):
    orig_shape = x.shape
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    bm = min(ROWS_PER_STEP, ((m + 7) // 8) * 8)
    m_pad = ((m + bm - 1) // bm) * bm
    has_res = residual is not None
    x2 = _pad_rows(x2, m_pad)[None]
    r2 = (_pad_rows(residual.reshape(-1, d), m_pad)[None]
          if has_res else jnp.zeros((1, d), x.dtype))  # unused 2-D dummy
    grid = (m_pad // bm,)

    y, mu, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps, has_residual=has_res),
        grid=grid,
        in_specs=[_row_spec(bm, d),
                  _row_spec(bm, d) if has_res else _vec_spec(d),
                  _vec_spec(d), _vec_spec(d)],
        out_specs=(_row_spec(bm, d), _stat_spec(bm), _stat_spec(bm)),
        out_shape=(
            jax.ShapeDtypeStruct((1, m_pad, d), x.dtype),
            jax.ShapeDtypeStruct((1, m_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # float32 temporaries push past Mosaic's default 16MB scoped budget
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, r2, gamma.reshape(1, d).astype(x.dtype), beta.reshape(1, d).astype(x.dtype))
    return y[0, :m].reshape(orig_shape), mu, rstd, m_pad, bm


def _ln_bwd_impl(x, residual, gamma, mu, rstd, g, eps, interpret):
    orig_shape = x.shape
    d = x.shape[-1]
    m = x.reshape(-1, d).shape[0]
    bm = min(ROWS_PER_STEP, ((m + 7) // 8) * 8)
    m_pad = ((m + bm - 1) // bm) * bm
    has_res = residual is not None
    x2 = _pad_rows(x.reshape(-1, d), m_pad)[None]
    r2 = (_pad_rows(residual.reshape(-1, d), m_pad)[None]
          if has_res else jnp.zeros((1, d), x.dtype))  # unused 2-D dummy
    g2 = _pad_rows(g.reshape(-1, d), m_pad)[None]
    grid = (m_pad // bm,)
    n_blocks = m_pad // bm

    dx, dgp, dbp = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, has_residual=has_res),
        grid=grid,
        in_specs=[_row_spec(bm, d),
                  _row_spec(bm, d) if has_res else _vec_spec(d),
                  _vec_spec(d), _stat_spec(bm), _stat_spec(bm), _row_spec(bm, d)],
        out_specs=(_row_spec(bm, d),
                   pl.BlockSpec((1, 8, d), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, d), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((1, m_pad, d), x.dtype),
            jax.ShapeDtypeStruct((1, n_blocks * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((1, n_blocks * 8, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # float32 temporaries push past Mosaic's default 16MB scoped budget
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, r2, gamma.reshape(1, d).astype(x.dtype), mu, rstd, g2)
    dx = dx[0, :m].reshape(orig_shape)
    dgamma = jnp.sum(dgp[0], axis=0) / 8.0  # rows are 8x broadcast copies
    dbeta = jnp.sum(dbp[0], axis=0) / 8.0
    return dx, dgamma, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x: Array, gamma: Array, beta: Array,
                    eps: float = 1e-5, interpret: bool = False) -> Array:
    """``LN(x)`` over the last dim; one HBM read + write."""
    y, _, _, _, _ = _ln_fwd_impl(x, None, gamma, beta, eps, interpret)
    return y


def _fl_fwd(x, gamma, beta, eps, interpret):
    y, mu, rstd, _, _ = _ln_fwd_impl(x, None, gamma, beta, eps, interpret)
    return y, (x, gamma, mu, rstd)


def _fl_bwd(eps, interpret, res, g):
    x, gamma, mu, rstd = res
    dx, dg, db = _ln_bwd_impl(x, None, gamma, mu, rstd, g, eps, interpret)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


fused_layernorm.defvjp(_fl_fwd, _fl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_layernorm_residual(x: Array, r: Array, gamma: Array, beta: Array,
                             eps: float = 1e-5, interpret: bool = False) -> Array:
    """``LN(x + r)`` with the add fused into the kernel (post-norm residual);
    the add's backward is the identity, so dx == dr (one cotangent array)."""
    y, _, _, _, _ = _ln_fwd_impl(x, r, gamma, beta, eps, interpret)
    return y


def _flr_fwd(x, r, gamma, beta, eps, interpret):
    y, mu, rstd, _, _ = _ln_fwd_impl(x, r, gamma, beta, eps, interpret)
    return y, (x, r, gamma, mu, rstd)


def _flr_bwd(eps, interpret, res, g):
    x, r, gamma, mu, rstd = res
    dx, dg, db = _ln_bwd_impl(x, r, gamma, mu, rstd, g, eps, interpret)
    return dx, dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


fused_layernorm_residual.defvjp(_flr_fwd, _flr_bwd)


def layernorm(x: Array, scale: Array, bias: Array, eps: float,
              impl: str = "auto", residual=None, interpret: bool = False) -> Array:
    """Dispatching LayerNorm: the fused Pallas kernel on TPU, a plain-XLA
    float32 implementation elsewhere (flax-equivalent numerics: f32 stats,
    fast variance with the max(0,.) clamp)."""
    if impl == "auto":
        # measured on v5e: the standalone Pallas LN made the canonical step
        # SLOWER (258ms vs 210ms) — XLA's LN fusions win (they fuse the
        # surrounding elementwise ops and handle the lane-dim reduction well),
        # so auto resolves to the XLA path; "pallas" stays opt-in
        impl = "xla"
    if impl == "pallas":
        if residual is not None:
            return fused_layernorm_residual(x, residual, scale, bias, eps, interpret)
        return fused_layernorm(x, scale, bias, eps, interpret)
    if residual is not None:
        x = x + residual
    xf = x.astype(jnp.float32)
    # NOTE: a dot-with-ones form of these stats was tried to dodge the minor-
    # dim reduce; XLA's algebraic simplifier rewrites N=1 dots straight back
    # into reduces (measured net-zero at the canonical step), so keep the
    # plain form
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
