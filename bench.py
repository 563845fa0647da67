"""Benchmark harness: DINO pretrain throughput (images/sec/chip) for the
flagship chadavit16-moyen config on mixed 1-10-channel batches.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference repo publishes no numbers (BASELINE.md); the A100
reference figure is the analytic estimate recorded in BASELINE.md
(A100_EST_IMG_S below) until a measured number replaces it.
"""

import json
import sys
import time


A100_EST_IMG_S = 40.0  # analytic A100 estimate for the torch reference; see BASELINE.md
BATCH = 32
STEPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from chadavit_tpu.parallel.mesh import make_mesh
    from chadavit_tpu.train.pretrain import DinoPretrainSpec, build_dino, synthetic_dino_batch

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
    batch = synthetic_dino_batch(spec, batch_size=BATCH, seed=0)  # mixed 1-10 channels

    # compile + warmup (hard sync via scalar readback: async dispatch on the
    # tunneled backend makes block_until_ready unreliable for timing)
    state, metrics = step(state, batch)
    _ = float(metrics["dino_loss"])

    t0 = time.time()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    _ = float(metrics["dino_loss"])
    dt = time.time() - t0

    img_s = STEPS * BATCH / dt
    n_chips = max(len(jax.devices()), 1)
    img_s_chip = img_s / n_chips
    print(json.dumps({
        "metric": "dino_pretrain_images_per_sec_per_chip",
        "value": round(img_s_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s_chip / A100_EST_IMG_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
