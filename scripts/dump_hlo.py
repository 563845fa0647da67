"""Dump the optimized HLO of the canonical train step (width-10 bucket) for
offline inspection: python scripts/dump_hlo.py [width] [batch] > /tmp/step.hlo
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chadavit_tpu.parallel.mesh import make_mesh
from chadavit_tpu.train.pretrain import DinoPretrainSpec, build_dino


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    spec = DinoPretrainSpec(
        backbone_kwargs=dict(
            embed_dim=192, patch_size=16, return_all_tokens=False,
            max_number_channels=10, attn_impl="auto",
        ),
        img_size=224,
        max_channels=10,
        num_prototypes=4096,
        warmup_teacher_temperature_epochs=50,
        clip_grad=3.0,
        steps_per_epoch=100,
        max_epochs=400,
        warmup_epochs=10,
        dtype=jnp.bfloat16,
    )
    state, step, _, _ = build_dino(spec, mesh=make_mesh(n_model=1))
    crops = jnp.zeros((2, batch, width, 224, 224), jnp.bfloat16)
    counts = jnp.full((batch,), width, jnp.int32)
    lowered = step.lower(state, {"crops": crops, "channel_counts": counts})
    compiled = lowered.compile()
    print(compiled.as_text())


if __name__ == "__main__":
    main()
