"""Device-time microbench: fused encoder-block kernel vs the unfused layer
(flash attention + XLA LN/FFN) at the canonical shape (B=64, S=1961, D=192,
H=2, F=2048, bf16)."""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from devtime import device_time

from chadavit_tpu.models.chada_vit import EncoderLayer

B, S, D, H, F = 64, 1961, 192, 2, 2048


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    counts = jnp.asarray(rng.integers(9, 11, (B,)), jnp.int32)
    vl = 1 + counts * 196
    mask = jnp.arange(S)[None, :] >= vl[:, None]

    layers = {
        "unfused": EncoderLayer(embed_dim=D, num_heads=H, ffn_dim=F,
                                dtype=jnp.bfloat16, block_impl="xla"),
        "fused": EncoderLayer(embed_dim=D, num_heads=H, ffn_dim=F,
                              dtype=jnp.bfloat16, block_impl="fused"),
    }
    params = layers["unfused"].init(jax.random.PRNGKey(0), x, mask, valid_len=vl)

    for name, layer in layers.items():
        fwd = jax.jit(lambda p, x, layer=layer:
                      layer.apply(p, x, mask, valid_len=vl))

        def loss(p, x, layer=layer):
            y = layer.apply(p, x, mask, valid_len=vl)
            return jnp.sum(jnp.where(mask[:, :, None], 0.0,
                                     y.astype(jnp.float32)) ** 2)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        ms_f = device_time(fwd, (params, x), reps=20)
        ms_g = device_time(grad, (params, x), reps=20)
        print(f"{name:8s} fwd {ms_f:7.3f} ms   fwd+bwd {ms_g:7.3f} ms")


if __name__ == "__main__":
    main()
