"""Fused channel-adaptive tokenizer — Pallas kernel (SURVEY §7.6a).

Fuses the whole ChAdaViT tokenization of one channel plane into one kernel
pass over VMEM (reference ``channel_aware_tokenization``, ``chada_vit.py:219-270``):

    unfold(plane) @ W + b  +  pos_embed  +  channel_token[c]

Grid is ``(B, C)``: each step reads one ``(H, W)`` plane, unfolds it to
``(N, p*p)`` patches with sublane reshapes (no HBM round-trip for the unfold —
the XLA path materializes the patch matrix), runs the ``(N, p*p) @ (p*p, D)``
MXU matmul, and adds bias + positional row + that channel's token before a
single write of the ``(N, D)`` block.

The CLS token is prepended outside the kernel (one row). Opt-in via
``ChAdaViT(tokenizer_impl="pallas")``; the XLA conv path remains the default
and the parity reference.

KNOWN LIMITATION: the in-VMEM unfold is a lane-dimension reshape
(``(224,224) -> (14,16,14,16)``) that current Mosaic cannot lower
("infer-vector-layout: unsupported shape cast"), so this kernel runs in
interpret mode only; on real TPUs the XLA conv emitter path (which measures
~16 ms/step at the canonical config, ~7%) is used. Revisit when Mosaic grows
strided lane slicing or lane reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _tokenizer_kernel(x_ref, w_ref, b_ref, pos_ref, chtok_ref, o_ref, *, patch: int):
    c = pl.program_id(1)
    plane = x_ref[0, 0]  # (H, W)
    h, w = plane.shape
    gh, gw = h // patch, w // patch

    # unfold: (H, W) -> (gh, p, gw, p) -> (gh, gw, p, p) -> (N, p*p)
    patches = plane.reshape(gh, patch, gw, patch)
    patches = patches.transpose(0, 2, 1, 3).reshape(gh * gw, patch * patch)

    tokens = jax.lax.dot_general(
        patches, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tokens = tokens + b_ref[...].astype(jnp.float32)
    tokens = tokens + pos_ref[...].astype(jnp.float32)
    tokens = tokens + chtok_ref[pl.ds(c, 1), :].astype(jnp.float32)
    o_ref[0, 0] = tokens.astype(o_ref.dtype)


def _fused_tokenize_fwd_impl(x, kernel, bias, patch_pos, channel_tokens,
                             patch, interpret):
    b, c, h, w = x.shape
    n = (h // patch) * (w // patch)
    d = kernel.shape[1]
    dtype = x.dtype

    out = pl.pallas_call(
        functools.partial(_tokenizer_kernel, patch=patch),
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda bi, ci: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((patch * patch, d), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((channel_tokens.shape[0], d), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, d), lambda bi, ci: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n, d), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, kernel.astype(dtype), bias.astype(dtype).reshape(1, d),
      patch_pos.astype(dtype), channel_tokens.astype(dtype))
    return out.reshape(b, c * n, d)


def _unfold(x: Array, patch: int) -> Array:
    """(B, C, H, W) -> (B, C, N, p*p) patch matrix (host of the kernel's
    in-VMEM unfold, used only on the backward pass)."""
    b, c, h, w = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(b, c, gh * gw, patch * patch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_tokenize(
    x: Array,  # (B, C, H, W)
    kernel: Array,  # (p*p, D)
    bias: Array,  # (D,)
    patch_pos: Array,  # (N, D) positional rows for the patch grid
    channel_tokens: Array,  # (C_model, D) one token per channel slot
    patch: int = 16,
    interpret: bool = False,
) -> Array:
    """Returns ``(B, C*N, D)`` fully-embedded patch tokens.

    Differentiable: the forward is the fused Pallas kernel; the backward is
    three XLA matmuls/reductions (``dx = fold(g @ W^T)``,
    ``dW = unfold(x)^T @ g``, sum-reductions for bias/pos/channel tokens) —
    the linearity of the op makes the VJP exact."""
    return _fused_tokenize_fwd_impl(x, kernel, bias, patch_pos, channel_tokens,
                                    patch, interpret)


def _ft_vjp_fwd(x, kernel, bias, patch_pos, channel_tokens, patch, interpret):
    out = _fused_tokenize_fwd_impl(x, kernel, bias, patch_pos, channel_tokens,
                                   patch, interpret)
    # bias/pos/chtok are small; keeping them in residuals is cheaper than
    # encoding shape+dtype separately (residuals must be JAX types)
    return out, (x, kernel, bias, patch_pos, channel_tokens)


def _ft_vjp_bwd(patch, interpret, res, g):
    x, kernel, bias_r, pos_r, ch_r = res
    b_shape, pos_shape, ch_shape = bias_r.shape, pos_r.shape, ch_r.shape
    b_dt, pos_dt, ch_dt = bias_r.dtype, pos_r.dtype, ch_r.dtype
    b, c, h, w = x.shape
    gh, gw = h // patch, w // patch
    n = gh * gw
    d = kernel.shape[1]
    g = g.reshape(b, c, n, d)
    gf = g.astype(jnp.float32)

    # dx = fold(g @ W^T)
    dp = jax.lax.dot_general(g, kernel.astype(g.dtype),
                             (((3,), (1,)), ((), ())))  # (B, C, N, p*p)
    dp = dp.reshape(b, c, gh, gw, patch, patch).transpose(0, 1, 2, 4, 3, 5)
    dx = dp.reshape(b, c, h, w).astype(x.dtype)

    # dW = unfold(x)^T @ g over all (b, c, n)
    patches = _unfold(x, patch).reshape(b * c * n, patch * patch)
    dW = jax.lax.dot_general(patches.astype(jnp.float32), gf.reshape(b * c * n, d),
                             (((0,), (0,)), ((), ()))).astype(kernel.dtype)

    db = jnp.sum(gf, axis=(0, 1, 2)).reshape(b_shape).astype(b_dt)
    dpos = jnp.sum(gf, axis=(0, 1)).reshape(pos_shape).astype(pos_dt)
    dch = jnp.sum(gf, axis=(0, 2))  # (C, D)
    if dch.shape[0] != ch_shape[0]:  # model capacity wider than this batch
        dch = jnp.pad(dch, ((0, ch_shape[0] - dch.shape[0]), (0, 0)))
    dch = dch.reshape(ch_shape).astype(ch_dt)
    return dx, dW, db, dpos, dch


fused_tokenize.defvjp(_ft_vjp_fwd, _ft_vjp_bwd)
