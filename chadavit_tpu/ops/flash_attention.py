"""Pallas flash attention for prefix-masked (padded variable-channel) sequences,
with a custom VJP so the DINO train step differentiates through it.

ChAdaViT pads every image's channels to ``C_max``; after tokenization the valid
tokens of image ``b`` are exactly the contiguous prefix of length
``valid_len[b] = 1 + num_patches * channel_count[b]`` (reference
``chada_vit.py:226-242`` pads at the end). A dense attention over the padded
``S = 1 + C_max * N`` sequence wastes up to ``C_max / c`` of its FLOPs.

Both forward and backward iterate key blocks only up to
``ceil(valid_len / BLOCK)`` per image. The backward additionally skips *query*
blocks beyond the valid prefix: the loss is independent of padded-token
outputs (they are never attended to as keys and never extracted), so their
output cotangents are exactly zero and contribute nothing to dQ/dK/dV.

Outputs match the masked-softmax reference (torch ``key_padding_mask``
semantics, reference ``chada_vit.py:105-111``): keys are masked, queries are
not, so per-query outputs depend only on valid keys.

Layout notes (TPU):
- head_dim (96 for the canonical 192/2 config) is zero-padded to 128 lanes;
  zero-padded K columns do not change q·k and zero-padded V columns are sliced
  off afterwards.
- Online softmax in float32; the row max starts at a large negative *finite*
  value so fully-masked in-block columns never produce NaNs.
- The key loop is a ``fori_loop`` with a data-dependent trip count — one
  compiled program for every channel-count mix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK = 256
_NEG_LARGE = -1e30
# lse/delta row tensors carry a small lane dim so their blocks satisfy the
# TPU (8, 128)-or-equal tiling rule without a 128x lane broadcast in HBM
LANES = 8


# ---------------------------------------------------------------- forward ----
def _fwd_kernel(vl_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, block_k: int):
    b = pl.program_id(0)
    vl = vl_ref[b]

    q = q_ref[0, 0]  # (BQ, hd) in input dtype: MXU-native (bf16) with f32 accumulation
    bq, hd = q.shape
    num_k_blocks = pl.cdiv(vl, block_k)

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < vl, s, _NEG_LARGE)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                                                (((1,), (0,)), ((), ())),
                                                preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_LARGE, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, hd), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), (bq, LANES))


# --------------------------------------------------------------- backward ----
def _dq_kernel(vl_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, scale: float, block_k: int):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    vl = vl_ref[b]

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, 0:1]      # (BQ, 1)
    delta = delta_ref[0, 0][:, 0:1]  # (BQ, 1)
    bq, hd = q.shape
    num_k_blocks = pl.cdiv(vl, block_k)

    def body(j, dq):
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < vl, s, _NEG_LARGE)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(k_blk.dtype)
        return dq + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq0 = jnp.zeros((bq, hd), jnp.float32)
    # query blocks fully beyond the valid prefix carry zero cotangent: zero
    # trips (cheaper than lax.cond under Mosaic)
    trips = jnp.where(qi * bq < vl, num_k_blocks, 0)
    dq = jax.lax.fori_loop(0, trips, body, dq0)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(vl_ref, q_ref, k_ref, v_ref, do_ref, lse_t_ref, delta_t_ref,
                dk_ref, dv_ref, *, scale: float, block_q: int):
    """dK/dV in fully TRANSPOSED form: every matmul contracts over the lane
    (last) dim of its lhs or the sublane (first) dim of its rhs — MXU-native —
    whereas the straightforward formulation needs ``p^T @ do`` / ``ds^T @ q``
    (dim-0/dim-0 contractions) that cost an extra relayout per tile. lse/delta
    arrive lane-major ``(LANES, S_pad)`` for the same reason."""
    b = pl.program_id(0)
    kj = pl.program_id(2)
    vl = vl_ref[b]

    k_blk = k_ref[0, 0]  # (BK, hd)
    v_blk = v_ref[0, 0]
    bk, hd = k_blk.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + kj * bk  # key idx
    num_q_blocks = pl.cdiv(vl, block_q)  # only valid-prefix queries carry cotangent

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse_r = lse_t_ref[0, 0, 0:1, pl.ds(i * block_q, block_q)]      # (1, BQ)
        delta_r = delta_t_ref[0, 0, 0:1, pl.ds(i * block_q, block_q)]  # (1, BQ)
        s_t = jax.lax.dot_general(k_blk, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) * scale  # (BK, BQ)
        s_t = jnp.where(row < vl, s_t, _NEG_LARGE)
        p_t = jnp.exp(s_t - lse_r)
        dv = dv + jax.lax.dot_general(p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(v_blk, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # (BK, BQ)
        ds_t = (p_t * (dp_t - delta_r) * scale).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    z = (jnp.zeros((bk, hd), jnp.float32), jnp.zeros((bk, hd), jnp.float32))
    # whole key block masked -> zero grads via zero loop trips
    trips = jnp.where(kj * bk < vl, num_q_blocks, 0)
    dk, dv = jax.lax.fori_loop(0, trips, body, z)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ------------------------------------------------------------ entry points ----
def _pad_axis(x: Array, axis: int, target: int) -> Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _prep(x: Array, num_heads: int, s_pad: int, hd_pad: int) -> Array:
    b, s, d = x.shape
    hd = d // num_heads
    xh = x.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    return _pad_axis(_pad_axis(xh, 3, hd_pad), 2, s_pad)


def _qspec(block: int, hd_pad: int):
    return pl.BlockSpec((1, 1, block, hd_pad), lambda bi, hi, ti, vl: (bi, hi, ti, 0),
                        memory_space=pltpu.VMEM)


def _full_spec(s_pad: int, hd_pad: int):
    return pl.BlockSpec((1, 1, s_pad, hd_pad), lambda bi, hi, ti, vl: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(block: int):
    return pl.BlockSpec((1, 1, block, LANES), lambda bi, hi, ti, vl: (bi, hi, ti, 0),
                        memory_space=pltpu.VMEM)


def _row_full_spec(s_pad: int):
    return pl.BlockSpec((1, 1, s_pad, LANES), lambda bi, hi, ti, vl: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)


def _lane_full_spec(s_pad: int):
    """Lane-major row tensor (B, H, LANES, S_pad), full block."""
    return pl.BlockSpec((1, 1, LANES, s_pad), lambda bi, hi, ti, vl: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_impl(q, k, v, valid_len, num_heads, block, interpret):
    b, s, d = q.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    # keep the native head dim when it is sublane-aligned (Mosaic's block rule
    # allows last-dim == array-dim); saves the 96->128 zero-pad traffic of the
    # canonical 192/2 config. Otherwise pad up to a lane multiple.
    hd_pad = hd if hd % 8 == 0 else max(128, ((hd + 127) // 128) * 128)
    s_pad = ((s + block - 1) // block) * block

    qh = _prep(q, num_heads, s_pad, hd_pad)
    kh = _prep(k, num_heads, s_pad, hd_pad)
    vh = _prep(v, num_heads, s_pad, hd_pad)
    grid = (b, num_heads, s_pad // block)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[_qspec(block, hd_pad), _full_spec(s_pad, hd_pad), _full_spec(s_pad, hd_pad)],
            out_specs=(_qspec(block, hd_pad), _row_spec(block)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s_pad, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qh, kh, vh)
    return out, lse, (qh, kh, vh, s_pad, hd_pad, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def prefix_flash_attention(
    q: Array,
    k: Array,
    v: Array,
    valid_len: Array,
    num_heads: int,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> Array:
    """Masked MHA where key ``j`` of batch ``b`` is valid iff ``j < valid_len[b]``.

    q/k/v: ``(B, S, D)``. Returns ``(B, S, D)`` in the dtype of ``q``.
    """
    out, _, (_, _, _, s_pad, hd_pad, _) = _fwd_impl(q, k, v, valid_len, num_heads, block, interpret)
    b, s, d = q.shape
    hd = d // num_heads
    return out[:, :, :s, :hd].transpose(0, 2, 1, 3).reshape(b, s, d)


def _vjp_fwd(q, k, v, valid_len, num_heads, block, interpret):
    out_h, lse, (qh, kh, vh, s_pad, hd_pad, scale) = _fwd_impl(
        q, k, v, valid_len, num_heads, block, interpret
    )
    b, s, d = q.shape
    hd = d // num_heads
    out = out_h[:, :, :s, :hd].transpose(0, 2, 1, 3).reshape(b, s, d)
    return out, (qh, kh, vh, out_h, lse, valid_len, (b, s, d))


def _vjp_bwd(num_heads, block, interpret, res, g):
    qh, kh, vh, out_h, lse, valid_len, (b, s, d) = res
    hd = d // num_heads
    s_pad, hd_pad = qh.shape[2], qh.shape[3]
    scale = 1.0 / (hd ** 0.5)

    do = _prep(g, num_heads, s_pad, hd_pad)
    # delta = rowsum(dO * O) in f32 (cheap; XLA fuses)
    delta = jnp.sum(do.astype(jnp.float32) * out_h.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (LANES,))

    grid = (b, num_heads, s_pad // block)
    vl = valid_len.astype(jnp.int32)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                _qspec(block, hd_pad), _full_spec(s_pad, hd_pad), _full_spec(s_pad, hd_pad),
                _qspec(block, hd_pad), _row_spec(block), _row_spec(block),
            ],
            out_specs=_qspec(block, hd_pad),
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), qh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(vl, qh, kh, vh, do, lse, delta)

    # lane-major copies of lse/delta for the transposed dkv kernel
    def lane_major(x):  # (B,H,S_pad,LANES) -> (B,H,LANES,S_pad)
        return jnp.broadcast_to(x[..., 0][:, :, None, :],
                                (x.shape[0], x.shape[1], LANES, x.shape[2]))

    lse_t = lane_major(lse)
    delta_t = lane_major(delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                _full_spec(s_pad, hd_pad), _qspec(block, hd_pad), _qspec(block, hd_pad),
                _full_spec(s_pad, hd_pad), _lane_full_spec(s_pad), _lane_full_spec(s_pad),
            ],
            out_specs=(_qspec(block, hd_pad), _qspec(block, hd_pad)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), kh.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), vh.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(vl, qh, kh, vh, do, lse_t, delta_t)

    def unprep(xh):
        return xh[:, :, :s, :hd].transpose(0, 2, 1, 3).reshape(b, s, d)

    return unprep(dq), unprep(dk), unprep(dv), None


prefix_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
