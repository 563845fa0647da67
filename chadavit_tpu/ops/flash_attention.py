"""Pallas flash attention for prefix-masked (padded variable-channel) sequences,
with a custom VJP so the DINO train step differentiates through it.

ChAdaViT pads every image's channels to ``C_max``; after tokenization the valid
tokens of image ``b`` are exactly the contiguous prefix of length
``valid_len[b] = 1 + num_patches * channel_count[b]`` (reference
``chada_vit.py:226-242`` pads at the end). A dense attention over the padded
``S = 1 + C_max * N`` sequence wastes up to ``C_max / c`` of its FLOPs.

Both forward and backward iterate key blocks only up to
``ceil(valid_len / BLOCK)`` per image, and skip *query* blocks beyond the
valid prefix (their outputs are never consumed; their cotangents are zero).

Outputs match the masked-softmax reference (torch ``key_padding_mask``
semantics, reference ``chada_vit.py:105-111``): keys are masked, queries are
not, so per-query outputs depend only on valid keys.

Layout / scheduling notes (TPU):
- Grid is ``(B, H)`` with the query/key block loops INSIDE the kernel. At
  ChAdaViT sizes each block-pair does ~10 MFLOP, far too little to amortize a
  grid step (the sequential per-step cost is ~2us on v5e); a
  ``(B, H, blocks)`` grid was measured grid-overhead-bound. One grid step per
  (image, head) keeps the whole sequence resident in VMEM (~1.7 MB at
  S=2048, hd=96) and runs every block pair back-to-back.
- The backward is ONE fused kernel: dq, dk, dv share a single score/softmax
  recompute per block pair (5 matmuls per pair vs 7 for split dq/dkv kernels,
  and q/k/v/do are read once instead of twice). dq accumulates in a VMEM
  f32 scratch across key blocks; dk/dv accumulate in the inner-loop carry.
  All matmuls are MXU-native except the dq contraction (``ds_t^T @ k``),
  which contracts dim 0 of both operands — unavoidable in either score
  orientation because dq and dk/dv need opposite layouts.
- head_dim 96 (the canonical 192/2 config) is kept native (sublane-aligned);
  misaligned head dims pad to 128 lanes.
- Online softmax in float32; the row max starts at a large negative *finite*
  value so fully-masked in-block columns never produce NaNs.
- lse/delta row tensors carry a small lane dim (row-major ``(S, LANES)`` from
  the forward, lane-major ``(LANES, S)`` into the backward) so their blocks
  satisfy the (8, 128) tiling rule without 128x broadcasts in HBM.
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
LANES = 8


# ---------------------------------------------------------------- forward ----
def _fwd_kernel(vl_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                block: int, n_blocks: int):
    b = pl.program_id(0)
    vl = vl_ref[b]
    num_k_blocks = pl.cdiv(vl, block)

    def q_step(qi, _):
        q = q_ref[0, 0, pl.ds(qi * block, block), :]
        bq, hd = q.shape

        def body(j, carry):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[0, 0, pl.ds(j * block, block), :]
            v_blk = v_ref[0, 0, pl.ds(j * block, block), :]
            s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block
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
        # query blocks fully beyond the valid prefix: zero trips, zero output
        trips = jnp.where(qi * block < vl, num_k_blocks, 0)
        m, l, acc = jax.lax.fori_loop(0, trips, body, (m0, l0, acc0))

        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, pl.ds(qi * block, block), :] = (acc / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, pl.ds(qi * block, block), :] = jnp.broadcast_to(
            m + jnp.log(l_safe), (bq, LANES))
        return 0

    jax.lax.fori_loop(0, n_blocks, q_step, 0)


# ------------------------------------------------------- fused backward ----
def _bwd_kernel(vl_ref, q_ref, k_ref, v_ref, do_ref, lse_t_ref, delta_t_ref,
                dq_ref, dk_ref, dv_ref, dq_acc, *, scale: float, block: int,
                n_blocks: int):
    """Fused dQ/dK/dV: one score recompute per (key, query) block pair.

    Transposed (key-major) orientation: s_t/p_t/ds_t are ``(BK, BQ)`` so the
    dv (``p_t @ do``), dp (``v @ do^T``) and dk (``ds_t @ q``) matmuls contract
    lane/sublane dims natively; the dq contribution ``ds_t^T @ k`` is the one
    transposed contraction. dq accumulates into a VMEM f32 scratch spanning
    the whole sequence, written out once at the end.
    """
    b = pl.program_id(0)
    vl = vl_ref[b]
    num_q_blocks = pl.cdiv(vl, block)  # only valid-prefix queries carry cotangent
    num_k_blocks = pl.cdiv(vl, block)

    dq_acc[...] = jnp.zeros_like(dq_acc)

    def k_step(kj, _):
        k_blk = k_ref[0, 0, pl.ds(kj * block, block), :]
        v_blk = v_ref[0, 0, pl.ds(kj * block, block), :]
        bk, hd = k_blk.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + kj * block

        def q_step(i, carry):
            dk, dv = carry
            q = q_ref[0, 0, pl.ds(i * block, block), :]
            do = do_ref[0, 0, pl.ds(i * block, block), :]
            lse_r = lse_t_ref[0, 0, 0:1, pl.ds(i * block, block)]      # (1, BQ)
            delta_r = delta_t_ref[0, 0, 0:1, pl.ds(i * block, block)]  # (1, BQ)
            s_t = jax.lax.dot_general(k_blk, q, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
            s_t = jnp.where(row < vl, s_t, _NEG_LARGE)
            p_t = jnp.exp(s_t - lse_r)
            dv = dv + jax.lax.dot_general(p_t.astype(do.dtype), do,
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            dp_t = jax.lax.dot_general(v_blk, do, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            ds_t = (p_t * (dp_t - delta_r) * scale).astype(q.dtype)
            dk = dk + jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            # dq contribution: contract the key dim (dim 0 of both) — the one
            # non-native matmul; accumulate into the sequence-wide scratch
            dq_blk = jax.lax.dot_general(ds_t, k_blk, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            dq_acc[pl.ds(i * block, block), :] += dq_blk
            return dk, dv

        z = (jnp.zeros((bk, hd), jnp.float32), jnp.zeros((bk, hd), jnp.float32))
        # whole key block beyond the prefix -> zero trips, zero dk/dv
        trips = jnp.where(kj * block < vl, num_q_blocks, 0)
        dk, dv = jax.lax.fori_loop(0, trips, q_step, z)
        dk_ref[0, 0, pl.ds(kj * block, block), :] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0, pl.ds(kj * block, block), :] = dv.astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_blocks, k_step, 0)
    dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


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


def _full_spec(s_pad: int, hd_pad: int):
    return pl.BlockSpec((1, 1, s_pad, hd_pad), lambda bi, hi, vl: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_full_spec(s_pad: int):
    return pl.BlockSpec((1, 1, s_pad, LANES), lambda bi, hi, vl: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)


def _lane_full_spec(s_pad: int):
    """Lane-major row tensor (B, H, LANES, S_pad), full block."""
    return pl.BlockSpec((1, 1, LANES, s_pad), lambda bi, hi, vl: (bi, hi, 0, 0),
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
    grid = (b, num_heads)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block=block,
                          n_blocks=s_pad // block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[_full_spec(s_pad, hd_pad)] * 3,
            out_specs=(_full_spec(s_pad, hd_pad), _row_full_spec(s_pad)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s_pad, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
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
    # delta = rowsum(dO * O) in f32 (cheap; XLA fuses), lane-major for the
    # kernel's (1, BQ) row reads
    delta = jnp.sum(do.astype(jnp.float32) * out_h.astype(jnp.float32), axis=-1)
    delta_t = jnp.broadcast_to(delta[:, :, None, :], (b, num_heads, LANES, s_pad))
    lse_t = jnp.broadcast_to(lse[..., 0][:, :, None, :], (b, num_heads, LANES, s_pad))

    grid = (b, num_heads)
    vl = valid_len.astype(jnp.int32)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, block=block,
                          n_blocks=s_pad // block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                _full_spec(s_pad, hd_pad), _full_spec(s_pad, hd_pad),
                _full_spec(s_pad, hd_pad), _full_spec(s_pad, hd_pad),
                _lane_full_spec(s_pad), _lane_full_spec(s_pad),
            ],
            out_specs=(_full_spec(s_pad, hd_pad),) * 3,
            scratch_shapes=[pltpu.VMEM((s_pad, hd_pad), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), qh.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), kh.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s_pad, hd_pad), vh.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(vl, qh, kh, vh, do, lse_t, delta_t)

    def unprep(xh):
        return xh[:, :, :s, :hd].transpose(0, 2, 1, 3).reshape(b, s, d)

    return unprep(dq), unprep(dk), unprep(dv), None


prefix_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
