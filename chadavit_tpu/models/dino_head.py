"""DINO projection head (reference ``src/methods/dino.py:32-111``).

3-layer MLP (hidden 2048, GELU, optional BatchNorm) -> L2-normalized bottleneck
(256) -> weight-normalized prototype layer (no bias). The weight-norm
magnitude ``g`` is initialised to 1 and frozen when ``norm_last_layer=True``
(reference ``dino.py:78-84``), making the prototype matrix row-L2-normalized.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class DINOHead(nn.Module):
    in_dim: int
    num_prototypes: int
    use_bn: bool = False
    norm_last_layer: bool = True
    num_layers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    param_dtype: Any = jnp.float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        trunc02 = nn.initializers.truncated_normal(stddev=0.02)
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, kernel_init=trunc02, param_dtype=self.param_dtype, dtype=self.dtype, name=name
        )
        num_layers = max(self.num_layers, 1)
        if num_layers == 1:
            x = dense(self.bottleneck_dim, "mlp_0")(x)
        else:
            x = dense(self.hidden_dim, "mlp_0")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, param_dtype=self.param_dtype,
                                 dtype=self.dtype, name="bn_0")(x)
            x = nn.gelu(x, approximate=False)
            for i in range(num_layers - 2):
                x = dense(self.hidden_dim, f"mlp_{i + 1}")(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=not train, param_dtype=self.param_dtype,
                                     dtype=self.dtype, name=f"bn_{i + 1}")(x)
                x = nn.gelu(x, approximate=False)
            x = dense(self.bottleneck_dim, f"mlp_{num_layers - 1}")(x)

        # L2-normalized bottleneck (reference dino.py:109)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        # weight-normalized prototype layer: kernel (bottleneck, P), column-normalized
        v = self.param(
            "last_layer_v",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.bottleneck_dim, self.num_prototypes),
            self.param_dtype,
        )
        g = self.param("last_layer_g", nn.initializers.ones, (self.num_prototypes,), self.param_dtype)
        v_ = v.astype(self.dtype)
        w = v_ / jnp.maximum(jnp.linalg.norm(v_, axis=0, keepdims=True), 1e-12)
        if self.norm_last_layer:
            # g frozen at 1 (reference dino.py:83-84): do not let gradients flow to g
            w = w * jax.lax.stop_gradient(g.astype(self.dtype))[None, :]
        else:
            w = w * g.astype(self.dtype)[None, :]
        return jnp.dot(x, w, preferred_element_type=self.dtype)
