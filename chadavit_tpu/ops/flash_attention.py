"""Pallas flash attention for prefix-masked (padded variable-channel) sequences.

ChAdaViT pads every image's channels to ``C_max``; after tokenization the valid
tokens of image ``b`` are exactly the contiguous prefix of length
``valid_len[b] = 1 + num_patches * channel_count[b]`` (reference
``chada_vit.py:226-242`` pads at the end). A dense attention over the padded
``S = 1 + C_max * N`` sequence wastes up to ``C_max / c`` of its FLOPs; this
kernel iterates key blocks only up to ``ceil(valid_len / BLOCK_K)`` per image,
recovering that waste while producing outputs identical to the masked softmax
(per-query outputs depend only on valid keys; the reference masks keys only —
torch ``key_padding_mask`` semantics, ``chada_vit.py:105-111``).

Layout notes (TPU):
- head_dim (96 for the canonical 192/2 config) is zero-padded to 128 lanes;
  zero-padding K columns does not change q·k, and zero-padded V columns are
  sliced off after the kernel.
- Online softmax in float32; the row max starts at a large negative finite value
  so fully-masked in-block columns never produce NaNs.
- Grid is ``(B, H, num_q_blocks)``; K/V live in VMEM per (batch, head) and the
  key loop is a ``fori_loop`` with a data-dependent trip count (lowered to a
  hardware loop — no recompilation per channel count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_NEG_LARGE = -1e30


def _flash_kernel(valid_len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    b = pl.program_id(0)
    vl = valid_len_ref[b]

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (BQ, hd)
    bq, hd = q.shape
    num_k_blocks = pl.cdiv(vl, block_k)

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * block_k
        scores = jnp.where(col < vl, scores, _NEG_LARGE)

        m_cur = jnp.max(scores, axis=-1, keepdims=True)  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_LARGE, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, hd), dtype=jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _pad_axis(x: Array, axis: int, target: int) -> Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "block_k", "interpret"))
def prefix_flash_attention(
    q: Array,
    k: Array,
    v: Array,
    valid_len: Array,
    num_heads: int,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> Array:
    """Masked MHA where key ``j`` of batch ``b`` is valid iff ``j < valid_len[b]``.

    q/k/v: ``(B, S, D)``. Returns ``(B, S, D)`` in the dtype of ``q``.
    """
    b, s, d = q.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)

    hd_pad = max(128, ((hd + 127) // 128) * 128)
    s_pad = ((s + max(block_q, block_k) - 1) // max(block_q, block_k)) * max(block_q, block_k)

    def prep(x):
        xh = x.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)  # (B, H, S, hd)
        xh = _pad_axis(_pad_axis(xh, 3, hd_pad), 2, s_pad)
        return xh

    qh, kh, vh = prep(q), prep(k), prep(v)
    num_q_blocks = s_pad // block_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_heads, num_q_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, hd_pad),
                lambda bi, hi, qi, vl: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, hd_pad),
                lambda bi, hi, qi, vl: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, hd_pad),
                lambda bi, hi, qi, vl: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, hd_pad),
            lambda bi, hi, qi, vl: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s_pad * s_pad * hd_pad,
            bytes_accessed=3 * b * num_heads * s_pad * hd_pad * q.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qh, kh, vh)

    out = out[:, :, :s, :hd].transpose(0, 2, 1, 3).reshape(b, s, d)
    return out
