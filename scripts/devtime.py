"""Device-time measurement helper for the tunneled dev TPU: wall-clock there
carries ~2 ms/call of host overhead, so kernel comparisons must come from
profiler traces (the sequential "XLA Ops" line).

Usage:
    from devtime import device_time
    ms = device_time(fn, args, reps=20)          # total ms/call on device
    ms = device_time(fn, args, reps=20, only="custom-call")
"""

import glob
import os
import tempfile


def device_time(fn, args, reps=20, only=None, per_op=False):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    logdir = tempfile.mkdtemp(prefix="devtime_")
    jax.profiler.start_trace(logdir)
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])  # hard sync through the tunnel
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    total = 0.0
    ops = {}
    for path in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for p in xs.planes:
            if not p.name.startswith("/device:TPU"):
                continue
            names = {k: v.name for k, v in p.event_metadata.items()}
            for line in p.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    nm = names.get(ev.metadata_id, "?")
                    if only is not None and only not in nm:
                        continue
                    dur = ev.duration_ps / 1e12
                    total += dur
                    key = nm.split(" = ")[0]
                    ops[key] = ops.get(key, 0.0) + dur
    ms = total / reps * 1e3
    if per_op:
        return ms, {k: v / reps * 1e3 for k, v in sorted(ops.items(), key=lambda kv: -kv[1])}
    return ms
