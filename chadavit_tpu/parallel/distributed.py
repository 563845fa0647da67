"""Multi-host initialization — the TPU-native replacement for Lightning's
``SLURMEnvironment`` + NCCL process groups (reference ``main_pretrain.py:301-309``).

On a TPU pod each host calls :func:`initialize` once before creating meshes;
``jax.distributed.initialize`` wires the hosts together and ``jax.devices()``
then spans the full slice (GSPMD shards over ICI within a slice and DCN across
slices). Under SLURM the coordinator/rank/world-size are derived from the
standard environment variables; on Cloud TPU the TPU metadata supplies them
automatically.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
from typing import List, Optional


def expand_slurm_nodelist(nodelist: str) -> List[str]:
    """Expand a SLURM compressed nodelist into hostnames.

    Handles bracket ranges with zero-padding, comma lists inside brackets,
    hyphenated hostname prefixes, and multiple bracket groups:
    ``gpu-node[01-03,07],login1`` -> ``[gpu-node01, gpu-node02, gpu-node03,
    gpu-node07, login1]``. Prefers ``scontrol show hostnames`` when available
    (the authoritative expander on a real cluster)."""
    nodelist = nodelist.strip()
    if not nodelist:
        return []
    if shutil.which("scontrol"):
        try:
            out = subprocess.run(
                ["scontrol", "show", "hostnames", nodelist],
                capture_output=True, text=True, timeout=10, check=True,
            ).stdout.split()
            if out:
                return out
        except Exception:
            pass  # fall through to the pure-python parser

    # split on commas that are outside brackets
    parts: List[str] = []
    depth, cur = 0, ""
    for ch in nodelist:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur:
        parts.append(cur)

    hosts: List[str] = []
    for part in parts:
        m = re.match(r"^(.*?)\[([^\]]+)\](.*)$", part)
        if not m:
            hosts.append(part)
            continue
        prefix, body, suffix = m.groups()
        for seg in body.split(","):
            if "-" in seg:
                lo, hi = seg.split("-", 1)
                for i in range(int(lo), int(hi) + 1):
                    hosts.append(f"{prefix}{str(i).zfill(len(lo))}{suffix}")
            else:
                hosts.append(f"{prefix}{seg}{suffix}")
    return hosts


def slurm_env() -> Optional[dict]:
    """Extract coordinator/rank info from SLURM variables (the reference's
    SLURMEnvironment role). The coordinator is the first expanded hostname of
    ``SLURM_JOB_NODELIST``."""
    if "SLURM_JOB_ID" not in os.environ:
        return None
    nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
    hosts = expand_slurm_nodelist(nodelist)
    first = hosts[0] if hosts else "localhost"
    return {
        "coordinator_address": f"{first}:{os.environ.get('CHADAVIT_COORD_PORT', '12345')}",
        "num_processes": int(os.environ.get("SLURM_NTASKS", 1)),
        "process_id": int(os.environ.get("SLURM_PROCID", 0)),
    }


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX. Returns True when distributed mode is active.

    Resolution order: explicit args > SLURM env > Cloud-TPU auto-detection >
    single-host (no-op)."""
    import jax

    if num_processes is None:
        env = slurm_env()
        if env:
            coordinator_address = coordinator_address or env["coordinator_address"]
            num_processes = env["num_processes"]
            process_id = env["process_id"]

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    # Cloud TPU pods auto-detect with no args; harmless on single host
    try:
        jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception:
        return False


def is_primary() -> bool:
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True


def globalize_batch(batch: dict, mesh, batch_keys=("images", "crops",
                                                   "small_crops",
                                                   "channel_counts", "labels"),
                    force: bool = False):
    """Assemble per-host batch arrays into global jax.Arrays sharded on the
    mesh's data axis (multi-host DP: each process loaded a DISJOINT rank shard
    via ``HostLoader(shard=...)`` — the TPU-native analogue of the reference
    DALI pipeline's ``shard_id=global_rank, num_shards=world_size``, reference
    ``dali_dataloader.py:765-767``).

    ``crops`` / ``small_crops`` are crop-major ``(n_crops, B, ...)`` so their
    batch dim is axis 1; everything else shards axis 0. Non-array and
    replicated entries (e.g. ``rng``) pass through untouched."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chadavit_tpu.parallel.mesh import DATA_AXIS

    if jax.process_count() == 1 and not force:
        return batch
    out = {}
    for k, v in batch.items():
        if k not in batch_keys:
            out[k] = v
            continue
        arr = np.asarray(v)
        axis = 1 if k in ("crops", "small_crops") else 0
        spec = [None] * arr.ndim
        spec[axis] = DATA_AXIS
        sharding = NamedSharding(mesh, P(*spec))
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out
