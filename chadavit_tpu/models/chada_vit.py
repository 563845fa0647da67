"""Channel-Adaptive Vision Transformer (ChAda-ViT) — TPU-native JAX implementation.

Re-implements the semantics of the reference PyTorch model
(`/root/reference/src/backbones/vit/chada_vit.py`) with a TPU-first design:

- **Dense static shapes.** The reference consumes a ragged ``(sum(channels), 1, H, W)``
  tensor plus per-image channel counts and pads *tokens* with zeros at runtime
  (reference ``chada_vit.py:219-242``). Here the batch is a dense
  ``(B, C_max, H, W)`` array plus a ``(B,)`` int vector of real channel counts;
  the key-padding mask is computed *analytically* from the counts (equivalent to
  the reference's data-derived all-zeros mask, ``chada_vit.py:239``, since conv
  bias makes real tokens nonzero — see SURVEY §2.4 #5) so everything jits with
  one static shape.
- **MXU-friendly tokenization.** The 1-channel Conv2d patch embed
  (reference ``chada_vit.py:128``) is an exact reshape+matmul (stride == kernel),
  which XLA maps straight onto the MXU.
- **Swappable attention kernel.** Attention is routed through
  :mod:`chadavit_tpu.ops.attention`, which provides an XLA reference path and a
  Pallas masked-flash kernel exploiting the *prefix* structure of the padding
  (valid tokens are always a contiguous prefix ``1 + 196*c``).

Replicated reference quirks (SURVEY §2.4; required for checkpoint parity):

1. Post-norm encoder layer applies ``norm1`` twice:
   ``x = norm1(x + sa(norm1(x)))`` then ``x = norm2(x + ff(x))``
   (reference ``chada_vit.py:96-100``).
2. FFN width fixed at 2048 regardless of embed dim, with **ReLU** activation
   (torch ``TransformerEncoderLayer`` default; reference ``chada_vit.py:160``).
3. ``num_heads=2`` in the canonical factory (reference ``chada_vit.py:338``).
4. Block LayerNorm eps 1e-5 (torch default), final norm eps 1e-6
   (reference ``chada_vit.py:338``: ``partial(nn.LayerNorm, eps=1e-6)``).
5. Channel token added only when ``max_channels == self.max_channels``
   (reference ``chada_vit.py:248-250``); the attention-viz path passes
   ``max_channels=1`` and skips it.
6. The same positional-embedding row is broadcast to every channel; CLS gets
   ``pos_embed[:, :, 0]`` (reference ``chada_vit.py:245,262``).
7. ``return_all_tokens`` yields all non-masked non-CLS tokens; here the dense
   token tensor plus validity mask is returned and ragged extraction happens
   outside jit (reference ``chada_vit.py:283-287``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chadavit_tpu.ops.attention import masked_multihead_attention
from chadavit_tpu.ops.layernorm import layernorm


Array = jax.Array


class LNParams(nn.Module):
    """LayerNorm parameters only (scale/bias with flax's LayerNorm tree
    naming), applied through :func:`chadavit_tpu.ops.layernorm.layernorm` —
    the fused Pallas kernel on TPU, flax-equivalent XLA math elsewhere."""

    dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        return scale, bias


def channel_padding_mask(channel_counts: Array, max_channels: int, num_patches: int) -> Array:
    """Analytic key-padding mask from per-image channel counts.

    Equivalent to the reference's data-derived mask (``chada_vit.py:239,268``):
    True marks a *padded* (invalid) token. Shape ``(B, 1 + max_channels*num_patches)``;
    position 0 is the CLS token and always False.
    """
    b = channel_counts.shape[0]
    chan_idx = jnp.arange(max_channels * num_patches, dtype=jnp.int32) // num_patches
    mask = chan_idx[None, :] >= channel_counts[:, None].astype(jnp.int32)
    cls_col = jnp.zeros((b, 1), dtype=bool)
    return jnp.concatenate([cls_col, mask], axis=1)


class PatchEmbed(nn.Module):
    """Single-channel patch embedding (reference ``TokenLearner``, ``chada_vit.py:118-134``).

    Two equivalent lowerings of the stride==kernel Conv2d:
    - ``use_conv=True`` (default): ``lax.conv_general_dilated`` with NHWC
      output — XLA's TPU conv emitter produces token-major layouts without the
      6-D transpose copy the unfold path materializes (measured ~120MB of
      2x-padded HLO temp per step at B=32).
    - ``use_conv=False``: explicit unfold + ``(B*C*N, p*p) @ (p*p, D)`` matmul
      (the numerics-reference path).
    Both share the same ``(p*p, D)`` kernel parameter (importer-compatible).
    """

    patch_size: int
    embed_dim: int
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32
    use_conv: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (..., H, W) single-channel planes
        p = self.patch_size
        *lead, h, w = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p * p, self.embed_dim),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), self.param_dtype)
        if self.use_conv:
            n = 1
            for d in lead:
                n *= d
            x4 = x.reshape(n, 1, h, w).astype(self.dtype)
            k4 = kernel.reshape(p, p, 1, self.embed_dim).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x4, k4, window_strides=(p, p), padding="VALID",
                dimension_numbers=("NCHW", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )  # (N, gh, gw, D)
            y = y.reshape(*lead, gh * gw, self.embed_dim)
            return y + bias.astype(self.dtype)
        x = x.reshape(*lead, gh, p, gw, p)
        x = x.transpose(*range(len(lead)), len(lead), len(lead) + 2, len(lead) + 1, len(lead) + 3)
        x = x.reshape(*lead, gh * gw, p * p)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype), preferred_element_type=self.dtype)
        return y + bias.astype(self.dtype)


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with the reference's double-norm1 quirk.

    Mirrors torch ``TransformerEncoderLayer(norm_first=False)`` as used by the
    reference (``chada_vit.py:96-100,160``): ReLU FFN, fixed ``ffn_dim``,
    LayerNorm eps 1e-5, packed-QKV attention.
    """

    embed_dim: int
    num_heads: int
    ffn_dim: int = 2048
    dropout_rate: float = 0.0
    layer_norm_eps: float = 1e-5
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    ln_impl: str = "auto"
    # "auto" (fused Pallas layer kernel on TPU when it applies), "fused"
    # (force, interpreted off-TPU), or "xla" (the unfused reference path).
    # "auto" keys off the effective default device at TRACE time (honors
    # jax.default_device scopes); when lowering for a
    # non-default backend (jit(..., backend=...) or AOT cross-lowering) set
    # block_impl="xla" explicitly — the trace-time probe cannot see the target.
    block_impl: str = "auto"
    # multi-device (data, model) mesh: Pallas paths must run under shard_map
    # (GSPMD cannot partition a pallas_call) — batch shards over data, heads
    # over model. None = single device, direct kernel calls.
    shard_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array],
        *,
        deterministic: bool = True,
        return_attention: bool = False,
        valid_len: Optional[Array] = None,
    ) -> Array:
        d = self.embed_dim
        n1_scale, n1_bias = LNParams(d, self.param_dtype, name="norm1")()
        n2_scale, n2_bias = LNParams(d, self.param_dtype, name="norm2")()

        # --- fused whole-layer Pallas kernel (ops/fused_block.py): one HBM
        # read + write per layer instead of ~10 memory-bound XLA fusions.
        # During init the XLA path below must run to CREATE the params.
        if (not self.is_initializing() and not return_attention
                and valid_len is not None and self.dropout_rate == 0.0
                and self.block_impl in ("auto", "fused")):
            from chadavit_tpu.ops import fused_block
            from chadavit_tpu.ops.attention import _on_tpu

            on_tpu = _on_tpu()
            blk = fused_block.pick_block(x.shape[1])
            s_pad = -(-x.shape[1] // blk) * blk
            fits = (d % self.num_heads == 0 and (d // self.num_heads) % 8 == 0
                    and fused_block.vmem_estimate(
                        s_pad, d, self.ffn_dim, self.num_heads,
                        blk, jnp.dtype(self.dtype).itemsize)
                    <= fused_block.VMEM_BYTES)
            if fits and (self.block_impl == "fused" or on_tpu):
                p = self.variables["params"]
                weights = (
                    p["in_proj_kernel"], p["in_proj_bias"],
                    p["out_proj_kernel"], p["out_proj_bias"],
                    n1_scale, n1_bias, n2_scale, n2_bias,
                    p["linear1"]["kernel"], p["linear1"]["bias"],
                    p["linear2"]["kernel"], p["linear2"]["bias"],
                )

                def _fused(x_, vl_, *ws):
                    return fused_block.fused_encoder_block(
                        x_, vl_, *ws,
                        self.num_heads, self.layer_norm_eps,
                        self.layer_norm_eps, blk, not on_tpu)

                if self.shard_mesh is not None and self.shard_mesh.size > 1:
                    # multi-device DP: shard_map the whole-layer kernel over
                    # the data axis (weights replicated; GSPMD cannot
                    # partition the pallas custom call itself)
                    from jax.sharding import PartitionSpec as P

                    from chadavit_tpu.parallel.mesh import DATA_AXIS

                    rep = P()
                    fn = jax.shard_map(
                        _fused, mesh=self.shard_mesh,
                        in_specs=(P(DATA_AXIS), P(DATA_AXIS)) + (rep,) * 12,
                        out_specs=P(DATA_AXIS), check_vma=False)
                    return fn(x, valid_len, *weights)
                return _fused(x, valid_len, *weights)

        def ln(v, scale, bias, residual=None):
            return layernorm(v, scale, bias, self.layer_norm_eps,
                             impl=self.ln_impl, residual=residual)

        # --- self-attention block (packed QKV, as in torch MultiheadAttention) ---
        in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (d, 3 * d), self.param_dtype
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), self.param_dtype)
        out_kernel = self.param(
            "out_proj_kernel", nn.initializers.xavier_uniform(), (d, d), self.param_dtype
        )
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (d,), self.param_dtype)

        h = ln(x, n1_scale, n1_bias)
        qkv = jnp.dot(h, in_proj_kernel.astype(self.dtype), preferred_element_type=self.dtype)
        qkv = qkv + in_proj_bias.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        attn_out, attn_weights = masked_multihead_attention(
            q,
            k,
            v,
            key_padding_mask=key_padding_mask,
            num_heads=self.num_heads,
            impl=self.attn_impl,
            return_weights=return_attention,
            valid_len=valid_len,
            mesh=None if self.is_initializing() else self.shard_mesh,
        )
        if return_attention:
            return attn_weights

        attn_out = jnp.dot(attn_out, out_kernel.astype(self.dtype), preferred_element_type=self.dtype)
        attn_out = attn_out + out_bias.astype(self.dtype)
        if self.dropout_rate > 0.0:
            attn_out = nn.Dropout(rate=self.dropout_rate, name="dropout1")(attn_out, deterministic=deterministic)

        # post-norm with double norm1 (reference chada_vit.py:99); the
        # residual add is fused into the LN kernel
        x = ln(attn_out, n1_scale, n1_bias, residual=x)

        # --- feed-forward block: Linear -> ReLU -> Linear (torch default activation) ---
        h = nn.Dense(self.ffn_dim, param_dtype=self.param_dtype, dtype=self.dtype, name="linear1")(x)
        h = jax.nn.relu(h)
        if self.dropout_rate > 0.0:
            h = nn.Dropout(rate=self.dropout_rate, name="dropout_ffn")(h, deterministic=deterministic)
        h = nn.Dense(d, param_dtype=self.param_dtype, dtype=self.dtype, name="linear2")(h)
        if self.dropout_rate > 0.0:
            h = nn.Dropout(rate=self.dropout_rate, name="dropout2")(h, deterministic=deterministic)

        x = ln(h, n2_scale, n2_bias, residual=x)
        return x


class ChAdaViT(nn.Module):
    """Channel-Adaptive ViT (reference ``ChAdaViT``, ``chada_vit.py:136-330``).

    Inputs are dense: ``x`` of shape ``(B, C_max, H, W)`` and ``channel_counts``
    of shape ``(B,)`` (number of real channels per image; the rest is padding).
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 2
    ffn_dim: int = 2048
    max_channels: int = 10
    return_all_tokens: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0  # reused as per-layer dropout, matching the reference quirk
    layer_norm_eps: float = 1e-5
    final_norm_eps: float = 1e-6
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    ln_impl: str = "auto"
    block_impl: str = "auto"
    shard_mesh: Any = None  # multi-device mesh for the Pallas paths (see EncoderLayer)
    # pad the token sequence (1 + C_max*N = 1961 canonically) up to a multiple
    # of this so every matmul/kernel tiles cleanly on (8,128) hardware tiles;
    # extra positions are masked and sliced off. 0 disables.
    # pad token sequences to this multiple before the encoder stack; 128
    # (not 256) because 1+196c lands on odd 128-multiples for c in {3,7,9}
    # and the kernels take 128-blocks there (see flash_attention.pick_block)
    seq_pad_multiple: int = 128
    patch_embed_conv: bool = True

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        n = self.num_patches
        trunc02 = partial(nn.initializers.truncated_normal, stddev=0.02)
        self.cls_token = self.param("cls_token", trunc02(), (1, 1, self.embed_dim), self.param_dtype)
        self.channel_token = self.param(
            "channel_token", trunc02(), (1, self.max_channels, 1, self.embed_dim), self.param_dtype
        )
        self.pos_embed = self.param("pos_embed", trunc02(), (1, 1, n + 1, self.embed_dim), self.param_dtype)
        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            param_dtype=self.param_dtype,
            dtype=self.dtype,
            use_conv=self.patch_embed_conv,
            name="patch_embed",
        )
        # stochastic-depth schedule misused as dropout, kept for fidelity
        # (reference chada_vit.py:158-161); default drop_path_rate=0 => all zero.
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        self.blocks = [
            EncoderLayer(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                dropout_rate=dpr[i],
                layer_norm_eps=self.layer_norm_eps,
                param_dtype=self.param_dtype,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                ln_impl=self.ln_impl,
                block_impl=self.block_impl,
                shard_mesh=self.shard_mesh,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm_params = LNParams(self.embed_dim, self.param_dtype, name="norm")

    def norm(self, x: Array) -> Array:
        scale, bias = self.norm_params()
        return layernorm(x, scale, bias, self.final_norm_eps, impl=self.ln_impl)

    def _patch_pos_embed(self, w: int, h: int) -> Array:
        """Positional embeddings for the patch grid of a (w, h) input.

        Bicubic-interpolates when the input resolution differs from training
        (reference ``add_pos_encoding_per_channel``, ``chada_vit.py:185-217``).
        """
        n = self.num_patches
        w0, h0 = w // self.patch_size, h // self.patch_size
        patch_pos = self.pos_embed[:, :, 1:]  # (1, 1, N, D)
        if w0 * h0 == n and w == h:
            return patch_pos
        side = int(math.sqrt(n))
        grid = patch_pos.reshape(side, side, self.embed_dim)
        grid = jax.image.resize(grid, (w0, h0, self.embed_dim), method="bicubic")
        return grid.reshape(1, 1, w0 * h0, self.embed_dim)

    def tokenize(
        self,
        x: Array,
        channel_counts: Array,
        *,
        max_channels: Optional[int] = None,
        deterministic: bool = True,
    ) -> tuple[Array, Array]:
        """Channel-aware tokenization (reference ``channel_aware_tokenization``,
        ``chada_vit.py:219-270``) on a dense ``(B, C, H, W)`` batch.

        Returns ``(embeddings (B, 1 + C*N, D), key_padding_mask (B, 1 + C*N))``.
        """
        # ``max_channels=None`` is the standard forward: the dense width may be
        # *smaller* than the model capacity (channel-count bucketing — batches
        # grouped by similar counts skip padded-channel FFN/LN work entirely);
        # channel tokens for the first ``c`` slots are added, which is exactly
        # what the reference computes on a to-10-padded batch for those images.
        # An explicit ``max_channels`` reproduces the reference quirk of adding
        # channel tokens only at full capacity (the attention-viz path passes 1
        # and skips them, reference chada_vit.py:248-250,314).
        add_channel_tokens = (max_channels is None) or (max_channels == self.max_channels)
        if max_channels is None:
            max_channels = x.shape[1]
        b, c, h, w = x.shape
        assert c == max_channels
        assert c <= self.max_channels

        n = (h // self.patch_size) * (w // self.patch_size)
        mask = channel_padding_mask(channel_counts, c, n)  # (B, 1 + C*N)

        # Tokenization runs through XLA's conv emitter (MXU patch-embed
        # matmul + fused pos/channel-token adds): measures ~1.4 ms of the
        # ~196 ms canonical step. A fused Pallas tokenizer was built and
        # deleted — Mosaic cannot lower the in-VMEM unfold's lane reshape, so
        # it only ever ran interpreted; the XLA path is the design choice,
        # not a fallback (see ROADMAP "Resolved").
        tokens = self.patch_embed(x.astype(self.dtype))  # (B, C, N, D)
        # positional embedding: the same row broadcast over channels
        tokens = tokens + self._patch_pos_embed(w, h).astype(self.dtype)
        if add_channel_tokens:
            tokens = tokens + self.channel_token[:, :c].astype(self.dtype)
        tokens = tokens.reshape(b, c * n, self.embed_dim)

        cls = self.cls_token.astype(self.dtype) + self.pos_embed[:, :, 0].astype(self.dtype)
        cls = jnp.broadcast_to(cls, (b, 1, self.embed_dim))
        embeddings = jnp.concatenate([cls, tokens], axis=1)

        if self.drop_rate > 0.0:
            embeddings = nn.Dropout(rate=self.drop_rate, name="pos_drop")(
                embeddings, deterministic=deterministic
            )
        return embeddings, mask

    def __call__(
        self,
        x: Array,
        channel_counts: Array,
        *,
        deterministic: bool = True,
        return_dense_tokens: bool = False,
    ):
        """Forward pass (reference ``ChAdaViT.forward``, ``chada_vit.py:272-289``).

        Args:
            x: dense batch ``(B, C_max, H, W)``; padded channels may hold anything
               (they are masked out analytically).
            channel_counts: ``(B,)`` number of real channels per image.
            return_dense_tokens: overrides ``return_all_tokens`` handling — always
               returns the dense ``(tokens, valid_mask)`` pair so ragged extraction
               can happen outside jit.

        Returns:
            ``(B, D)`` CLS embeddings when ``return_all_tokens=False``; otherwise
            ``(tokens (B, C_max*N, D), valid (B, C_max*N))`` where ``valid`` marks
            real (non-padded) tokens, matching the reference's ragged
            ``return_all_tokens`` output once filtered.

        Padded positions (``valid == False``) are NOT contractual: the fused
        block kernel zero-fills rows in fully-invalid sequence blocks while the
        unfused path computes (deterministic but meaningless) values there, so
        the two ``block_impl`` settings differ at padded positions. Consumers
        must filter by ``valid`` before using the token tensor.
        """
        emb, mask = self.tokenize(x, channel_counts, deterministic=deterministic)
        n = self.num_patches
        s_real = emb.shape[1]
        if self.seq_pad_multiple:
            m = self.seq_pad_multiple
            s_pad = ((s_real + m - 1) // m) * m
            if s_pad != s_real:
                emb = jnp.pad(emb, ((0, 0), (0, s_pad - s_real), (0, 0)))
                mask = jnp.pad(mask, ((0, 0), (0, s_pad - s_real)), constant_values=True)
        # prefix structure: valid tokens are exactly the first 1 + count*N positions
        valid_len = 1 + channel_counts.astype(jnp.int32) * n
        for blk in self.blocks:
            emb = blk(emb, mask, deterministic=deterministic, valid_len=valid_len)
        emb = self.norm(emb)
        emb = emb[:, :s_real]
        mask = mask[:, :s_real]

        if self.return_all_tokens or return_dense_tokens:
            tokens = emb[:, 1:]
            valid = ~mask[:, 1:]
            return tokens, valid
        return emb[:, 0]

    def channel_token_sanity_check(self, verbose: bool = True):
        """Consistency checks on the learned channel tokens (reference
        ``chada_vit.py:291-311``): each channel slot carries one distinct
        vector, identical across patches and batch by construction here; this
        reports inter-channel token distances for debugging collapse."""
        import numpy as _np

        tok = _np.asarray(self.channel_token)[0, :, 0]  # (C, D)
        d = _np.linalg.norm(tok[:, None] - tok[None, :], axis=-1)
        if verbose:
            print("channel-token pairwise L2 distances:\n", _np.round(d, 3))
        return d

    def get_last_selfattention(self, x: Array) -> Array:
        """Attention weights of the last block for a single-channel input
        (reference ``chada_vit.py:313-320``; used by ``main_attn.py``).

        Args:
            x: ``(B, 1, H, W)`` single-channel batch.

        Returns:
            ``(B, num_heads, S, S)`` attention weights, S = 1 + (H/p)*(W/p).
        """
        counts = jnp.ones((x.shape[0],), dtype=jnp.int32)
        emb, mask = self.tokenize(x, counts, max_channels=1)
        valid_len = jnp.full((x.shape[0],), emb.shape[1], dtype=jnp.int32)
        for blk in self.blocks[:-1]:
            emb = blk(emb, mask, valid_len=valid_len)
        return self.blocks[-1](emb, mask, return_attention=True, valid_len=valid_len)

    def get_intermediate_layers(self, x: Array, channel_counts: Array, n: int = 1):
        """Normed outputs of the last ``n`` blocks (reference ``chada_vit.py:322-330``)."""
        emb, mask = self.tokenize(x, channel_counts)
        np_ = self.num_patches
        valid_len = 1 + channel_counts.astype(jnp.int32) * np_
        outputs = []
        for i, blk in enumerate(self.blocks):
            emb = blk(emb, mask, valid_len=valid_len)
            if len(self.blocks) - i <= n:
                outputs.append(self.norm(emb))
        return outputs


def chada_vit(**kwargs) -> ChAdaViT:
    """Canonical factory matching the reference (``chada_vit.py:333-339``):
    depth 12, heads 2, final-norm eps 1e-6."""
    return ChAdaViT(
        patch_size=kwargs.get("patch_size", 16),
        embed_dim=kwargs.get("embed_dim", 192),
        depth=kwargs.get("depth", 12),
        num_heads=kwargs.get("num_heads", 2),
        return_all_tokens=kwargs.get("return_all_tokens", True),
        max_channels=kwargs.get("max_number_channels", 10),
        img_size=kwargs.get("img_size", 224),
        dtype=kwargs.get("dtype", jnp.float32),
        param_dtype=kwargs.get("param_dtype", jnp.float32),
        attn_impl=kwargs.get("attn_impl", "auto"),
        ln_impl=kwargs.get("ln_impl", "auto"),
        block_impl=kwargs.get("block_impl", "auto"),
        shard_mesh=kwargs.get("shard_mesh"),
        seq_pad_multiple=kwargs.get("seq_pad_multiple", 128),
        patch_embed_conv=kwargs.get("patch_embed_conv", True),
    )


def densify_one_channel_batch(
    flat: Array, list_num_channels, max_channels: int
) -> tuple[Array, Array]:
    """Convert the reference's ragged collate layout ``(sum(c_i), 1, H, W)`` +
    per-image channel counts (reference ``channels_strategies.py:31-85``) into the
    dense ``(B, C_max, H, W)`` + ``(B,)`` layout used here. Host-side helper for
    API compatibility with ``HOW_TO_USE.ipynb`` cell-20/24.
    """
    import numpy as np

    flat = np.asarray(flat)
    if flat.ndim == 4:
        flat = flat[:, 0]
    counts = np.asarray(list_num_channels, dtype=np.int32)
    b = counts.shape[0]
    h, w = flat.shape[-2:]
    dense = np.zeros((b, max_channels, h, w), dtype=flat.dtype)
    off = 0
    for i, c in enumerate(counts):
        dense[i, :c] = flat[off : off + c]
        off += c
    return jnp.asarray(dense), jnp.asarray(counts)
