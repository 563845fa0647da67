"""Standard (timm-equivalent) Vision Transformer for the `one_channel` / RGB
baseline channel strategies.

The reference wraps timm's ``_create_vision_transformer`` with five size
factories, all ``num_classes=0, dynamic_img_size=True`` (reference
``src/backbones/vit/vit.py:26-89``); the first conv is later rebuilt for 1..N
input channels with weight duplication (reference
``src/data/channels_strategies.py:135-154``). Here the channel count is simply a
constructor argument, and weight duplication happens in the torch-checkpoint
importer instead.

Architecture matches timm ``VisionTransformer`` defaults: pre-norm blocks,
GELU MLP at 4x width, learnable CLS + position embeddings, qkv bias, final
LayerNorm (eps 1e-6), no classifier head.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chadavit_tpu.ops.attention import xla_masked_attention

Array = jax.Array


class ViTBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, return_attention: bool = False):
        d = self.embed_dim
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, param_dtype=self.param_dtype, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, param_dtype=self.param_dtype, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn, weights = xla_masked_attention(q, k, v, None, self.num_heads, return_weights=return_attention)
        if return_attention:
            return weights
        attn = nn.Dense(d, param_dtype=self.param_dtype, dtype=self.dtype, name="proj")(attn)
        x = x + attn
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, param_dtype=self.param_dtype, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), param_dtype=self.param_dtype, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, param_dtype=self.param_dtype, dtype=self.dtype, name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """timm-equivalent ViT over ``(B, C, H, W)`` inputs with a fixed channel count."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 1
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        n = self.num_patches
        trunc02 = nn.initializers.truncated_normal(stddev=0.02)
        self.cls_token = self.param("cls_token", trunc02, (1, 1, self.embed_dim), self.param_dtype)
        self.pos_embed = self.param("pos_embed", trunc02, (1, n + 1, self.embed_dim), self.param_dtype)
        self.patch_kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (self.in_chans * self.patch_size * self.patch_size, self.embed_dim),
            self.param_dtype,
        )
        self.patch_bias = self.param("patch_bias", nn.initializers.zeros, (self.embed_dim,), self.param_dtype)
        self.blocks = [
            ViTBlock(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                layer_norm_eps=self.layer_norm_eps,
                param_dtype=self.param_dtype,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(
            epsilon=self.layer_norm_eps, param_dtype=self.param_dtype, dtype=self.dtype, name="norm"
        )

    def _embed(self, x: Array) -> Array:
        b, c, h, w = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        # (B, C, gh, p, gw, p) -> (B, gh, gw, C, p, p) -> (B, N, C*p*p)
        x = x.reshape(b, c, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        tokens = jnp.dot(x.astype(self.dtype), self.patch_kernel.astype(self.dtype),
                         preferred_element_type=self.dtype) + self.patch_bias.astype(self.dtype)
        pos = self._interp_pos_embed(gh, gw)
        cls = jnp.broadcast_to(self.cls_token.astype(self.dtype), (b, 1, self.embed_dim)) + pos[:, :1]
        return jnp.concatenate([cls, tokens + pos[:, 1:]], axis=1)

    def _interp_pos_embed(self, gh: int, gw: int) -> Array:
        n = self.num_patches
        pos = self.pos_embed.astype(self.dtype)
        if gh * gw == n:
            return pos
        side = int(math.sqrt(n))
        grid = pos[:, 1:].reshape(side, side, self.embed_dim)
        grid = jax.image.resize(grid, (gh, gw, self.embed_dim), method="bicubic")
        return jnp.concatenate([pos[:, :1], grid.reshape(1, gh * gw, self.embed_dim)], axis=1)

    def __call__(self, x: Array, channel_counts: Optional[Array] = None, **_) -> Array:
        """Returns CLS features ``(B, D)``. ``channel_counts`` is accepted (and
        ignored) for call-signature compatibility with ChAdaViT."""
        tokens = self._embed(x)
        for blk in self.blocks:
            tokens = blk(tokens)
        tokens = self.norm(tokens)
        return tokens[:, 0]

    def get_last_selfattention(self, x: Array) -> Array:
        tokens = self._embed(x)
        for blk in self.blocks[:-1]:
            tokens = blk(tokens)
        return self.blocks[-1](tokens, return_attention=True)

    def get_intermediate_layers(self, x: Array, n: int = 1):
        tokens = self._embed(x)
        out = []
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens)
            if self.depth - i <= n:
                out.append(self.norm(tokens))
        return out


def _factory(embed_dim: int, depth: int, num_heads: int):
    def make(**kwargs) -> VisionTransformer:
        return VisionTransformer(
            img_size=kwargs.get("img_size", 224),
            patch_size=kwargs.get("patch_size", 16),
            in_chans=kwargs.get("in_chans", 1),
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            dtype=kwargs.get("dtype", jnp.float32),
            param_dtype=kwargs.get("param_dtype", jnp.float32),
        )

    return make


# size ladder matching reference src/backbones/vit/vit.py:26-89
vit_ultra_tiny = _factory(32, 12, 2)
vit_tiny = _factory(192, 12, 3)
vit_small = _factory(384, 12, 6)
vit_base = _factory(768, 12, 12)
vit_large = _factory(1024, 24, 16)
