"""Trace the canonical DINO train step on the real TPU and print a per-op
device-time breakdown (top HLO ops aggregated by fusion/op name).

Usage: python scripts/profile_step.py [width] [batch]
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict


def build_and_trace(width: int, batch: int, steps: int, logdir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from chadavit_tpu.data.device_augment import make_multicrop_fn
    from chadavit_tpu.parallel.mesh import make_mesh
    from chadavit_tpu.train.pretrain import DinoPretrainSpec, build_dino

    from bench import ASYMMETRIC_AUGS

    # CHADAVIT_PROFILE_MODEL=b16 profiles ChAdaViT-B/16 (embed 768, 12 heads;
    # the VMEM gate rejects the fused layer kernel there, so this measures the
    # unfused flash path with 4 head groups); default is chadavit16-moyen
    b16 = os.environ.get("CHADAVIT_PROFILE_MODEL", "moyen") == "b16"
    spec = DinoPretrainSpec(
        backbone_kwargs=dict(
            embed_dim=768 if b16 else 192,
            num_heads=12 if b16 else 2,
            patch_size=16, return_all_tokens=False,
            max_number_channels=10, attn_impl="auto",
            ln_impl=os.environ.get("CHADAVIT_PROFILE_LN", "auto"),
        ),
        img_size=224,
        max_channels=10,
        num_prototypes=65536 if b16 else 4096,
        warmup_teacher_temperature_epochs=50,
        clip_grad=3.0,
        steps_per_epoch=100,
        max_epochs=400,
        warmup_epochs=10,
        dtype=jnp.bfloat16,
    )
    # CHADAVIT_PROFILE_FUSED_AUG=1 profiles the production single-dispatch
    # program (augmentation compiled into the step, as bench.py runs it)
    fused_aug = os.environ.get("CHADAVIT_PROFILE_FUSED_AUG", "0") == "1"
    state, step, _, _ = build_dino(
        spec, mesh=make_mesh(n_model=1),
        device_augmentations=ASYMMETRIC_AUGS if fused_aug else None)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (batch, width, 224, 224), dtype=np.uint8))
    counts = jnp.asarray(rng.integers(max(1, width - 1), width + 1, (batch,), dtype=np.int32))
    aug_rng = jax.random.PRNGKey(0)

    if fused_aug:
        def run_one(rng_, st):
            return step(st, {"images": imgs, "channel_counts": counts,
                             "rng": rng_})
    else:
        device_aug = make_multicrop_fn(ASYMMETRIC_AUGS, dtype=spec.dtype)

        def run_one(rng_, st):
            out = device_aug(rng_, imgs, counts)
            return step(st, {"crops": out["crops"],
                             "channel_counts": out["channel_counts"]})

    # warmup/compile
    for _ in range(2):
        aug_rng, sub = jax.random.split(aug_rng)
        state, m = run_one(sub, state)
    _ = float(m["dino_loss"])

    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        aug_rng, sub = jax.random.split(aug_rng)
        state, m = run_one(sub, state)
    _ = float(m["dino_loss"])
    jax.profiler.stop_trace()


def parse_xplane(logdir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    agg = defaultdict(float)
    total = 0.0
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name == "XLA Modules":
                    for ev in line.events:
                        name = ev_names.get(ev.metadata_id, "?").split("(")[0]
                        agg["MODULE::" + name] += ev.duration_ps / 1e12
                # the sequential compute stream; async DMA lines overlap and
                # would double-count
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e12
                    agg[name] += dur
                    total += dur
    return agg, total


def main():
    if sys.argv[1:2] == ["--parse-only"]:
        logdir, steps = sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 5
    else:
        width = int(sys.argv[1]) if len(sys.argv) > 1 else 10
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
        logdir = tempfile.mkdtemp(prefix="chada_trace_")
        build_and_trace(width, batch, steps, logdir)
    agg, total = parse_xplane(logdir, steps)

    print("\n-- per jit module (ms/step) --")
    for name in sorted([k for k in agg if k.startswith("MODULE::")],
                       key=lambda k: -agg[k]):
        print(f"  {agg.pop(name)/steps*1e3:9.2f}  {name[8:][:90]}")

    # bucket by coarse kind for a summary
    kinds = defaultdict(float)
    for name, t in agg.items():
        n = name.lower()
        # classify by the HLO opcode (the token right before the operand
        # list), not by substrings of operand names
        op = re.search(r"\)?\s([a-z][\w-]*)\(", n)
        op = op.group(1) if op else n
        if "custom-call" in op:
            kinds["pallas custom-call"] += t
        elif "conv" in op:
            kinds["conv/matmul-fusion"] += t
        elif "dot" in op:
            kinds["dot"] += t
        elif "fusion" in op:
            kinds["fusion"] += t
        elif "copy" in op or "transpose" in op or "slice" in op:
            kinds["copy/transpose/slice"] += t
        elif "all-reduce" in op or "all-gather" in op:
            kinds["collective"] += t
        else:
            kinds["other:" + op] += t

    per_step = total / steps * 1e3
    print(f"\n== device total: {total*1e3:.1f} ms over {steps} steps -> {per_step:.1f} ms/step ==")
    print("\n-- by kind (ms/step) --")
    for k, t in sorted(kinds.items(), key=lambda kv: -kv[1]):
        print(f"  {t/steps*1e3:9.2f}  {k}")
    print("\n-- top 40 ops (ms/step) --")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {t/steps*1e3:9.3f}  {name[:140]}")
    print(f"\ntrace dir: {logdir}")


if __name__ == "__main__":
    main()
