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
from typing import Optional


def slurm_env() -> Optional[dict]:
    """Extract coordinator/rank info from SLURM variables (the reference's
    SLURMEnvironment role)."""
    if "SLURM_JOB_ID" not in os.environ:
        return None
    nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
    first = nodelist.split(",")[0].replace("[", "").split("-")[0] if nodelist else "localhost"
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
