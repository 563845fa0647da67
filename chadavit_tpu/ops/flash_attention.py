"""Pallas flash attention for prefix-masked (padded variable-channel) sequences,
with a custom VJP so the DINO train step differentiates through it.

ChAdaViT pads every image's channels to ``C_max``; after tokenization the valid
tokens of image ``b`` are exactly the contiguous prefix of length
``valid_len[b] = 1 + num_patches * channel_count[b]`` (reference
``chada_vit.py:226-242`` pads at the end). A dense attention over the padded
``S = 1 + C_max * N`` sequence wastes up to ``C_max / c`` of its FLOPs.

The forward skips *query* blocks fully beyond the valid prefix (their outputs
are never consumed; their cotangents are zero) and the backward skips *key*
blocks there (those keys are masked everywhere); partially-valid blocks are
handled by masking.

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
- **Full-row softmax, no online rescale.** At ChAdaViT sizes (S_pad <= 2048)
  a whole (BQ, S_pad) f32 score tile fits in VMEM, so each q block does one
  big score matmul, one exact softmax, one output matmul. The online-softmax
  running max/rescale chain serialized MXU against VPU (measured 2.70 ms ->
  1.68 ms per forward call at the canonical config from this restructure);
  heads interleaved inside the block loop overlap head h+1's matmul with
  head h's softmax.
- The backward is ONE fused kernel: dq, dk, dv share a single score/softmax
  recompute per key block covering ALL queries at once (the forward's lse
  makes the softmax exact). dq accumulates in an all-heads VMEM f32 scratch.
  All matmuls are MXU-native except the dq contraction (``ds_t^T @ k``),
  which contracts dim 0 of both operands — unavoidable in either score
  orientation because dq and dk/dv need opposite layouts. Query positions
  beyond ``vl`` self-cancel: their ``do``/``delta`` are identically zero and
  fully-skipped q blocks stored lse=+LARGE, so ``p_t`` underflows to 0.
- head_dim 96 (the canonical 192/2 config) is kept native (sublane-aligned);
  misaligned head dims pad to 128 lanes.
- Softmax in float32; masking is additive (-1e30) so masked columns
  underflow to exactly 0 without NaNs.
- Softmax runs in base 2 (``exp2``; the TPU VPU's native transcendental):
  ``softmax(s*scale) == exp2(s*scale*log2e - m2) / sum`` with the running max
  and lse kept in the base-2 domain. ``scale*log2e`` is folded into the
  q-block load (one (BQ, hd) multiply per q block instead of a (BQ, BK) pass
  per pair); the backward unfolds it from dq/dk at write-out. The saved lse is
  base-2 — an internal contract between this forward and this backward.
- Column masking uses a ``(1, BK)`` iota row broadcast through one select pass
  (a full-tile iota + compare + select costs three).
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
MIN_BLOCK = 128


def pick_block(s: int, default: int = DEFAULT_BLOCK) -> int:
    """Largest supported block size for a sequence of length ``s``.

    The model pads sequences to 128-multiples (``ChAdaViT.seq_pad_multiple``);
    ChAdaViT's 1 + 196c token counts often land on odd 128-multiples
    (c=3: 640, c=7: 1408, c=9: 1792) where rounding up to a 256 grid would
    waste 9-23% of the attention FLOPs in pure padding. Kernels therefore drop
    to 128-blocks when 256 does not divide ``s``."""
    if s % default == 0:
        return default
    if s % MIN_BLOCK == 0:
        return MIN_BLOCK
    return default


_NEG_LARGE = -1e30
_LOG2E = 1.4426950408889634
LANES = 8
# max lanes (heads * padded head dim) per kernel call; bounds VMEM at
# ~(4 inputs + 3 grads) * S_pad * MAX_GROUP_LANES * 2B + f32 scratch
MAX_GROUP_LANES = 384


# ---------------------------------------------------------------- forward ----
def _fwd_kernel(vl_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                block: int, n_blocks: int, num_heads: int, hd: int):
    """Full-row softmax per q block: at ChAdaViT sizes the whole key row fits
    in VMEM (S_pad <= 2048 -> a (BQ, S_pad) f32 score tile is <= 2 MB), so each
    q block does ONE (BQ, hd)x(hd, S_pad) score matmul, one exact softmax pass,
    and one (BQ, S_pad)x(S_pad, hd) output matmul — no online-softmax running
    max/rescale chain. Heads are interleaved inside the q-block loop so head
    h+1's score matmul (MXU) overlaps head h's softmax (VPU)."""
    b = pl.program_id(0)
    vl = vl_ref[b]
    s_pad = n_blocks * block
    # additive key mask row, computed once per batch element
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    neg = jnp.where(col < vl, 0.0, _NEG_LARGE).astype(jnp.float32)

    def q_step(qi, _):
        @pl.when(qi * block < vl)
        def _valid():
            for h in range(num_heads):  # static unroll; lane slices compile-time
                lo = h * hd
                # scale (and log2e for the base-2 softmax) folded into q: one
                # (BQ, hd) multiply instead of a (BQ, S) pass on the scores
                q = q_ref[0, pl.ds(qi * block, block), lo:lo + hd] * (scale * _LOG2E)
                s = jax.lax.dot_general(
                    q, k_ref[0, :, lo:lo + hd], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) + neg
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                acc = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[0, :, lo:lo + hd],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                o_ref[0, pl.ds(qi * block, block), lo:lo + hd] = (
                    acc / l).astype(o_ref.dtype)
                lse_ref[0, h, pl.ds(qi * block, block), :] = jnp.broadcast_to(
                    m + jnp.log2(l), (block, LANES))

        @pl.when(qi * block >= vl)
        def _padded():
            # fully-invalid q block: finite zeros (downstream LN/matmuls must
            # never see uninitialized VMEM) and lse=+LARGE so the backward's
            # full-row p_t = exp2(s - lse) underflows to exactly 0 there
            o_ref[0, pl.ds(qi * block, block), :] = jnp.zeros(
                (block, num_heads * hd), o_ref.dtype)
            for h in range(num_heads):
                lse_ref[0, h, pl.ds(qi * block, block), :] = jnp.full(
                    (block, LANES), -_NEG_LARGE, jnp.float32)

        return 0

    jax.lax.fori_loop(0, n_blocks, q_step, 0)


# ------------------------------------------------------- fused backward ----
def _bwd_kernel(vl_ref, q_ref, k_ref, v_ref, do_ref, lse_t_ref, delta_t_ref,
                dq_ref, dk_ref, dv_ref, dq_acc, *, scale: float, block: int,
                n_blocks: int, num_heads: int, hd: int):
    """Fused dQ/dK/dV, full query row per key block.

    Transposed (key-major) orientation: s_t/p_t/ds_t are ``(BK, S_pad)`` so the
    dv (``p_t @ do``), dp (``v @ do^T``) and dk (``ds_t @ q``) matmuls contract
    lane/sublane dims natively; the dq contribution ``ds_t^T @ k`` is the one
    transposed contraction. One score recompute per key block covers ALL
    queries at once (no online rescale; the forward's lse makes the softmax
    exact), and query positions beyond ``vl`` self-cancel: their cotangent
    ``do``/``delta`` are identically zero and the forward stored lse=+LARGE
    for fully-skipped q blocks, so ``p_t`` underflows to 0 there. Heads are
    interleaved inside the key-block loop for MXU/VPU overlap; dq accumulates
    into an all-heads (S_pad, H*hd) f32 scratch written out once."""
    b = pl.program_id(0)
    vl = vl_ref[b]

    dq_acc[...] = jnp.zeros_like(dq_acc)

    def k_step(kj, _):
        bk = block
        row = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + kj * block
        rneg = jnp.where(row < vl, 0.0, _NEG_LARGE).astype(jnp.float32)

        @pl.when(kj * block < vl)
        def _valid():
            for h in range(num_heads):
                lo = h * hd
                # base-2 scale folded into q (matches the forward); unfolded
                # from the dk/dq accumulators at write-out below
                q = q_ref[0, :, lo:lo + hd] * (scale * _LOG2E)
                do = do_ref[0, :, lo:lo + hd]
                lse_r = lse_t_ref[0, h, 0:1, :]      # (1, S_pad)
                delta_r = delta_t_ref[0, h, 0:1, :]  # (1, S_pad)
                k_blk = k_ref[0, pl.ds(kj * block, block), lo:lo + hd]
                v_blk = v_ref[0, pl.ds(kj * block, block), lo:lo + hd]
                s_t = jax.lax.dot_general(k_blk, q, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32) + rneg
                p_t = jnp.exp2(s_t - lse_r)
                dv = jax.lax.dot_general(p_t.astype(do.dtype), do,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                dp_t = jax.lax.dot_general(v_blk, do, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32)
                # unscaled ds: the true ds carries *scale, applied at write-out
                ds_t = (p_t * (dp_t - delta_r)).astype(q_ref.dtype)
                dk = jax.lax.dot_general(ds_t, q, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                # dq contribution: contract the key dim (dim 0 of both) — the
                # one non-native matmul; accumulate into the all-heads scratch
                dq_blk = jax.lax.dot_general(ds_t, k_blk, (((0,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                dq_acc[:, lo:lo + hd] += dq_blk
                # dk accumulated against q*(scale*log2e) but true ds carries
                # only *scale -> correct by 1/log2e (= ln 2)
                dk_ref[0, pl.ds(kj * block, block), lo:lo + hd] = (
                    dk * (1.0 / _LOG2E)).astype(dk_ref.dtype)
                dv_ref[0, pl.ds(kj * block, block), lo:lo + hd] = dv.astype(
                    dv_ref.dtype)

        @pl.when(kj * block >= vl)
        def _padded():
            dk_ref[0, pl.ds(kj * block, block), :] = jnp.zeros(
                (block, num_heads * hd), dk_ref.dtype)
            dv_ref[0, pl.ds(kj * block, block), :] = jnp.zeros(
                (block, num_heads * hd), dv_ref.dtype)

        return 0

    jax.lax.fori_loop(0, n_blocks, k_step, 0)
    # ds was accumulated unscaled -> dq carries the plain *scale here
    dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


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
                scratch_shapes=[pltpu.VMEM((s_pad, nh * hd_pad), jnp.float32)],
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
