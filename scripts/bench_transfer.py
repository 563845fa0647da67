"""Attribute the wall-vs-device gap: time the SAME timed step loop with
(a) device-resident batches (uploaded once, before timing) and
(b) per-step host->device uint8 uploads (the production/bench path).

The difference is what host transfer + dispatch costs through this host's
link (on the tunneled dev TPU that is mostly external contention +
per-dispatch RTT; on a production TPU VM it is PCIe and ~free). Device-trace
ms/step is identical in both modes by construction — this script measures
WALL only and prints one JSON line with both rates.

Usage: python scripts/bench_transfer.py [batch] [steps] [repeats]
"""

import json
import os
import sys
import time


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import ASYMMETRIC_AUGS

    from chadavit_tpu.cli import enable_compile_cache
    from chadavit_tpu.data.datasets import SyntheticChannels
    from chadavit_tpu.data.pipeline import HostLoader
    from chadavit_tpu.parallel.mesh import make_mesh
    from chadavit_tpu.train.pretrain import DinoPretrainSpec, build_dino

    enable_compile_cache()

    # CHADAVIT_XFER_TINY=1: toy shapes for a CPU smoke of the harness itself
    tiny = os.environ.get("CHADAVIT_XFER_TINY", "0") == "1"
    img, mc, depth = (32, 4, 2) if tiny else (224, 10, 12)
    spec = DinoPretrainSpec(
        backbone_kwargs=dict(embed_dim=64 if tiny else 192, patch_size=16,
                             return_all_tokens=False, max_number_channels=mc,
                             depth=depth, attn_impl="auto",
                             num_heads=2),
        img_size=img, max_channels=mc, num_prototypes=64 if tiny else 4096,
        warmup_teacher_temperature_epochs=50, clip_grad=3.0,
        steps_per_epoch=100, max_epochs=400, warmup_epochs=10,
        dtype=jnp.bfloat16,
    )
    augs = [dict(a, crop_size=img) for a in ASYMMETRIC_AUGS]
    state, step, _, _ = build_dino(spec, mesh=make_mesh(n_model=1),
                                   device_augmentations=augs)

    ds = SyntheticChannels(n=(steps + 10) * batch, img_size=img,
                           min_channels=1, max_channels=mc, seed=0, dtype=np.uint8)
    loader = HostLoader(ds, batch_size=batch, max_channels=mc, num_workers=4,
                        seed=0, channels_last=True,
                        bucket_by_channels=True, bucket_round=1, dtype=np.uint8)
    host_batches = list(loader)[:steps]
    n_img = sum(len(b["labels"]) for b in host_batches)
    xfer_bytes = sum(b["images"].nbytes for b in host_batches)

    aug_rng = jax.random.PRNGKey(0)

    # compile each width once
    seen = set()
    for b in host_batches:
        w = b["images"].shape[1]
        if w not in seen:
            seen.add(w)
            aug_rng, sub = jax.random.split(aug_rng)
            state, m = step(state, {"images": jnp.asarray(b["images"]),
                                    "channel_counts": jnp.asarray(b["channel_counts"]),
                                    "rng": sub})
            _ = float(m["dino_loss"])

    def timed_loop(state, make_dev_batch):
        nonlocal aug_rng
        best = None
        for _ in range(repeats):
            t0 = time.time()
            for b in host_batches:
                aug_rng, sub = jax.random.split(aug_rng)
                dev = make_dev_batch(b)
                dev["rng"] = sub
                state, m = step(state, dev)
            _ = float(m["dino_loss"])  # hard sync
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  repeat: {dt:.2f}s ({n_img / dt:.1f} img/s)", file=sys.stderr)
        return state, best

    print("per-step upload:", file=sys.stderr)
    state, dt_upload = timed_loop(state, lambda b: {
        "images": jnp.asarray(b["images"]),
        "channel_counts": jnp.asarray(b["channel_counts"])})

    resident = {}
    for i, b in enumerate(host_batches):
        resident[i] = {"images": jnp.asarray(b["images"]),
                       "channel_counts": jnp.asarray(b["channel_counts"])}
        b["_i"] = i
    jax.block_until_ready(resident)
    print("device-resident:", file=sys.stderr)
    # dict() per step: the jitted call must not donate the cached arrays
    # (images/channel_counts are not donated — only arg 0 is — so reuse is safe)
    state, dt_resident = timed_loop(state, lambda b: dict(resident[b["_i"]]))

    print(json.dumps({
        "metric": "transfer_gap",
        "batch": batch, "steps": steps,
        "upload_img_s": round(n_img / dt_upload, 1),
        "device_resident_img_s": round(n_img / dt_resident, 1),
        "transfer_wall_overhead_pct": round(100 * (dt_upload - dt_resident)
                                            / dt_upload, 1),
        "uploaded_mb_per_step": round(xfer_bytes / steps / 2**20, 2),
    }))


if __name__ == "__main__":
    main()
