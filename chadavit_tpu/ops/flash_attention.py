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
- **Model-native layout, no head transposes.** The kernels consume the
  ``(B, S_pad, D)`` activations directly (full-D blocks are always legal
  Mosaic tiles); heads are STATIC lane slices ``[h*hd : (h+1)*hd]`` unrolled
  inside the kernel. The former ``(B,S,H,hd)->(B,H,S,hd)`` relayouts cost
  ~24 ms/step of pure copies at the canonical config.
- Grid is just ``(B,)`` with head/query/key block loops inside the kernel. At
  ChAdaViT sizes each block-pair does ~10 MFLOP, far too little to amortize a
  grid step (~2us sequential cost on v5e); a ``(B, H, blocks)`` grid was
  measured grid-overhead-bound.
- Wide models are processed in HEAD GROUPS of at most ``MAX_GROUP_LANES``
  lanes per kernel call (contiguous lane slices) to bound VMEM; the canonical
  D=192 model is a single group (zero extra copies).
- The backward is ONE fused kernel: dq, dk, dv share a single score/softmax
  recompute per block pair (5 matmuls per pair vs 7 for split dq/dkv kernels,
  and q/k/v/do are read once instead of twice). dq accumulates in a VMEM
  f32 scratch; dk/dv accumulate in the inner-loop carry. All matmuls are
  MXU-native except the dq contraction (``ds_t^T @ k``), which contracts dim 0
  of both operands — unavoidable in either score orientation because dq and
  dk/dv need opposite layouts.
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

DEFAULT_BLOCK = 512
_NEG_LARGE = -1e30
LANES = 8
# max lanes (heads * padded head dim) per kernel call; bounds VMEM at
# ~(4 inputs + 3 grads) * S_pad * MAX_GROUP_LANES * 2B + f32 scratch
MAX_GROUP_LANES = 384


# ---------------------------------------------------------------- forward ----
def _fwd_kernel(vl_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                block: int, n_blocks: int, num_heads: int, hd: int):
    b = pl.program_id(0)
    vl = vl_ref[b]
    num_k_blocks = pl.cdiv(vl, block)

    for h in range(num_heads):  # static unroll; lane slices are compile-time
        lo = h * hd

        def q_step(qi, _):
            q = q_ref[0, pl.ds(qi * block, block), lo:lo + hd]
            bq = block

            def body(j, carry):
                m_prev, l_prev, acc = carry
                k_blk = k_ref[0, pl.ds(j * block, block), lo:lo + hd]
                v_blk = v_ref[0, pl.ds(j * block, block), lo:lo + hd]
                s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block
                s = jnp.where(col < vl, s, _NEG_LARGE)

                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_new, l_new, acc

            m0 = jnp.full((bq, 1), _NEG_LARGE, dtype=jnp.float32)
            l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
            acc0 = jnp.zeros((bq, hd), dtype=jnp.float32)
            # query blocks fully beyond the valid prefix: zero trips, zero out
            trips = jnp.where(qi * block < vl, num_k_blocks, 0)
            m, l, acc = jax.lax.fori_loop(0, trips, body, (m0, l0, acc0))

            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, pl.ds(qi * block, block), lo:lo + hd] = (
                acc / l_safe).astype(o_ref.dtype)
            lse_ref[0, h, pl.ds(qi * block, block), :] = jnp.broadcast_to(
                m + jnp.log(l_safe), (bq, LANES))
            return 0

        jax.lax.fori_loop(0, n_blocks, q_step, 0)


# ------------------------------------------------------- fused backward ----
def _bwd_kernel(vl_ref, q_ref, k_ref, v_ref, do_ref, lse_t_ref, delta_t_ref,
                dq_ref, dk_ref, dv_ref, dq_acc, *, scale: float, block: int,
                n_blocks: int, num_heads: int, hd: int):
    """Fused dQ/dK/dV: one score recompute per (key, query) block pair.

    Transposed (key-major) orientation: s_t/p_t/ds_t are ``(BK, BQ)`` so the
    dv (``p_t @ do``), dp (``v @ do^T``) and dk (``ds_t @ q``) matmuls contract
    lane/sublane dims natively; the dq contribution ``ds_t^T @ k`` is the one
    transposed contraction. dq accumulates per head into a VMEM f32 scratch
    spanning the sequence, written out once per head.
    """
    b = pl.program_id(0)
    vl = vl_ref[b]
    num_q_blocks = pl.cdiv(vl, block)  # only valid-prefix queries carry cotangent

    for h in range(num_heads):
        lo = h * hd
        dq_acc[...] = jnp.zeros_like(dq_acc)

        def k_step(kj, _):
            k_blk = k_ref[0, pl.ds(kj * block, block), lo:lo + hd]
            v_blk = v_ref[0, pl.ds(kj * block, block), lo:lo + hd]
            bk = block
            row = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + kj * block

            def q_step(i, carry):
                dk, dv = carry
                q = q_ref[0, pl.ds(i * block, block), lo:lo + hd]
                do = do_ref[0, pl.ds(i * block, block), lo:lo + hd]
                lse_r = lse_t_ref[0, h, 0:1, pl.ds(i * block, block)]      # (1, BQ)
                delta_r = delta_t_ref[0, h, 0:1, pl.ds(i * block, block)]  # (1, BQ)
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
                # dq contribution: contract the key dim (dim 0 of both) — the
                # one non-native matmul; accumulate into the per-head scratch
                dq_blk = jax.lax.dot_general(ds_t, k_blk, (((0,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                dq_acc[pl.ds(i * block, block), :] += dq_blk
                return dk, dv

            z = (jnp.zeros((bk, hd), jnp.float32), jnp.zeros((bk, hd), jnp.float32))
            # whole key block beyond the prefix -> zero trips, zero dk/dv
            trips = jnp.where(kj * block < vl, num_q_blocks, 0)
            dk, dv = jax.lax.fori_loop(0, trips, q_step, z)
            dk_ref[0, pl.ds(kj * block, block), lo:lo + hd] = dk.astype(dk_ref.dtype)
            dv_ref[0, pl.ds(kj * block, block), lo:lo + hd] = dv.astype(dv_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_blocks, k_step, 0)
        dq_ref[0, :, lo:lo + hd] = dq_acc[...].astype(dq_ref.dtype)


# ------------------------------------------------------------ entry points ----
def _full_spec(s_pad: int, d: int):
    return pl.BlockSpec((1, s_pad, d), lambda bi, vl: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _lse_spec(num_heads: int, s_pad: int):
    return pl.BlockSpec((1, num_heads, s_pad, LANES), lambda bi, vl: (bi, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _lane_spec(num_heads: int, s_pad: int):
    """Lane-major row tensor (B, H, LANES, S_pad), full block."""
    return pl.BlockSpec((1, num_heads, LANES, s_pad), lambda bi, vl: (bi, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _pads(q_shape, num_heads, block):
    b, s, d = q_shape
    hd = d // num_heads
    hd_pad = hd if hd % 8 == 0 else max(128, ((hd + 127) // 128) * 128)
    s_pad = ((s + block - 1) // block) * block
    return hd, hd_pad, s_pad


def _prep(x: Array, num_heads: int, s_pad: int, hd: int, hd_pad: int) -> Array:
    """(B, S, D) -> (B, S_pad, H*hd_pad): free reshape; zero-padding copies
    only when the seq/head dims are not already aligned."""
    b, s, d = x.shape
    if s == s_pad and hd == hd_pad:
        return x
    xh = x.reshape(b, s, num_heads, hd)
    xh = jnp.pad(xh, ((0, 0), (0, s_pad - s), (0, 0), (0, hd_pad - hd)))
    return xh.reshape(b, s_pad, num_heads * hd_pad)


def _unprep(xh: Array, b: int, s: int, d: int, num_heads: int, hd: int,
            hd_pad: int) -> Array:
    if xh.shape[1] == s and hd == hd_pad:
        return xh
    return xh.reshape(b, -1, num_heads, hd_pad)[:, :s, :, :hd].reshape(b, s, d)


def _head_groups(num_heads: int, hd_pad: int):
    """Split heads into contiguous groups of at most MAX_GROUP_LANES lanes."""
    per = max(1, MAX_GROUP_LANES // hd_pad)
    return [(g, min(g + per, num_heads)) for g in range(0, num_heads, per)]


def _fwd_impl(q, k, v, valid_len, num_heads, block, interpret):
    b, s, d = q.shape
    hd, hd_pad, s_pad = _pads(q.shape, num_heads, block)
    scale = 1.0 / (hd ** 0.5)

    qh = _prep(q, num_heads, s_pad, hd, hd_pad)
    kh = _prep(k, num_heads, s_pad, hd, hd_pad)
    vh = _prep(v, num_heads, s_pad, hd, hd_pad)
    vl = valid_len.astype(jnp.int32)

    outs, lses = [], []
    for g0, g1 in _head_groups(num_heads, hd_pad):
        nh = g1 - g0
        sl = slice(g0 * hd_pad, g1 * hd_pad)
        out_g, lse_g = pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, block=block,
                              n_blocks=s_pad // block, num_heads=nh, hd=hd_pad),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=[_full_spec(s_pad, nh * hd_pad)] * 3,
                out_specs=(_full_spec(s_pad, nh * hd_pad), _lse_spec(nh, s_pad)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s_pad, nh * hd_pad), q.dtype),
                jax.ShapeDtypeStruct((b, nh, s_pad, LANES), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                # double-buffered full-sequence blocks exceed Mosaic's default
                # 16MB scoped budget by a hair at the canonical config
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
            interpret=interpret,
        )(vl, qh[..., sl], kh[..., sl], vh[..., sl])
        outs.append(out_g)
        lses.append(lse_g)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    lse = lses[0] if len(lses) == 1 else jnp.concatenate(lses, axis=1)
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
    out, _, _ = _fwd_impl(q, k, v, valid_len, num_heads, block, interpret)
    b, s, d = q.shape
    hd, hd_pad, _ = _pads(q.shape, num_heads, block)
    return _unprep(out, b, s, d, num_heads, hd, hd_pad)


def _vjp_fwd(q, k, v, valid_len, num_heads, block, interpret):
    out_h, lse, (qh, kh, vh, s_pad, hd_pad, scale) = _fwd_impl(
        q, k, v, valid_len, num_heads, block, interpret
    )
    b, s, d = q.shape
    hd = d // num_heads
    out = _unprep(out_h, b, s, d, num_heads, hd, hd_pad)
    return out, (qh, kh, vh, out_h, lse, valid_len, (b, s, d))


def _vjp_bwd(num_heads, block, interpret, res, g):
    qh, kh, vh, out_h, lse, valid_len, (b, s, d) = res
    hd = d // num_heads
    s_pad = qh.shape[1]
    hd_pad = qh.shape[2] // num_heads
    scale = 1.0 / (hd ** 0.5)

    do = _prep(g, num_heads, s_pad, hd, hd_pad)
    # delta = rowsum(dO * O) per head in f32 (cheap; XLA fuses), lane-major
    # (B, H, LANES, S_pad) for the kernel's (1, BQ) row reads
    prod = (do.astype(jnp.float32) * out_h.astype(jnp.float32)).reshape(
        b, s_pad, num_heads, hd_pad)
    delta = jnp.sum(prod, axis=-1)  # (B, S_pad, H)
    delta_t = jnp.broadcast_to(delta.transpose(0, 2, 1)[:, :, None, :],
                               (b, num_heads, LANES, s_pad))
    lse_t = jnp.broadcast_to(lse[..., 0][:, :, None, :],
                             (b, num_heads, LANES, s_pad))

    vl = valid_len.astype(jnp.int32)
    dqs, dks, dvs = [], [], []
    for g0, g1 in _head_groups(num_heads, hd_pad):
        nh = g1 - g0
        sl = slice(g0 * hd_pad, g1 * hd_pad)
        hsl = slice(g0, g1)
        dq_g, dk_g, dv_g = pl.pallas_call(
            functools.partial(_bwd_kernel, scale=scale, block=block,
                              n_blocks=s_pad // block, num_heads=nh, hd=hd_pad),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b,),
                in_specs=[
                    _full_spec(s_pad, nh * hd_pad), _full_spec(s_pad, nh * hd_pad),
                    _full_spec(s_pad, nh * hd_pad), _full_spec(s_pad, nh * hd_pad),
                    _lane_spec(nh, s_pad), _lane_spec(nh, s_pad),
                ],
                out_specs=(_full_spec(s_pad, nh * hd_pad),) * 3,
                scratch_shapes=[pltpu.VMEM((s_pad, hd_pad), jnp.float32)],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s_pad, nh * hd_pad), qh.dtype),
                jax.ShapeDtypeStruct((b, s_pad, nh * hd_pad), kh.dtype),
                jax.ShapeDtypeStruct((b, s_pad, nh * hd_pad), vh.dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                # double-buffered full-sequence blocks exceed Mosaic's default
                # 16MB scoped budget by a hair at the canonical config
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
            interpret=interpret,
        )(vl, qh[..., sl], kh[..., sl], vh[..., sl], do[..., sl],
          lse_t[:, hsl], delta_t[:, hsl])
        dqs.append(dq_g)
        dks.append(dk_g)
        dvs.append(dv_g)

    def cat(parts):
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        return _unprep(x, b, s, d, num_heads, hd, hd_pad)

    return cat(dqs), cat(dks), cat(dvs), None


prefix_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
