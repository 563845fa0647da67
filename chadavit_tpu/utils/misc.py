"""Shared glue utilities (reference ``src/utils/misc.py``).

JAX equivalents of the reference's grab-bag: 2-D sin-cos positional embeddings
(``misc.py:305-361``), NaN/Inf hygiene (``misc.py:44-131``), deterministic
seeding (``misc.py:547``), and weight-decay exclusion (``misc.py:425-454`` —
see :func:`chadavit_tpu.train.optim.wd_mask`)."""

from __future__ import annotations

import os
import random
import sys
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def build_2d_sincos_posembed(grid_h: int, grid_w: int, embed_dim: int,
                             cls_token: bool = False, temperature: float = 10000.0) -> np.ndarray:
    """Fixed 2-D sin-cos positional embedding (reference ``misc.py:305-361``).

    Returns ``(1, grid_h*grid_w [+1], embed_dim)`` float32."""
    assert embed_dim % 4 == 0, "embed_dim must be divisible by 4 for 2d sincos"
    gw = np.arange(grid_w, dtype=np.float32)
    gh = np.arange(grid_h, dtype=np.float32)
    gw, gh = np.meshgrid(gw, gh)
    pos_dim = embed_dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = gw.reshape(-1)[:, None] * omega[None, :]
    out_h = gh.reshape(-1)[:, None] * omega[None, :]
    emb = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None].astype(np.float32)
    if cls_token:
        emb = np.concatenate([np.zeros((1, 1, embed_dim), np.float32), emb], axis=1)
    return emb


def filter_inf_n_nan(x: Array, replace: float = 0.0) -> Tuple[Array, Array]:
    """Replace non-finite entries; returns (cleaned, was_nonfinite_mask)
    (reference ``filter_inf_n_nan``, ``misc.py:82-131``)."""
    bad = ~jnp.isfinite(x)
    return jnp.where(bad, replace, x), bad


def count_nonfinite(tree) -> Array:
    """Total non-finite elements across a pytree (training-health probe)."""
    leaves = [jnp.sum(~jnp.isfinite(x)) for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    return sum(leaves) if leaves else jnp.zeros((), jnp.int32)


def seed_everything(seed: int) -> jax.Array:
    """Deterministic seeding of python/numpy RNGs; returns a JAX PRNG key
    (reference ``seed_everything_manual``, ``misc.py:547``)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def resolve_seed(cfg, default: int = 5) -> int:
    """Config seed with an explicit None check so ``seed: 0`` is honored
    (reference ``seed_everything(cfg.seed)`` respects 0; ``or 5`` would not).
    The reference leaves seed None → lightning randomizes; we default to 5
    (the value every shipped config uses) to stay deterministic."""
    seed = cfg.get("seed")
    return default if seed is None else int(seed)


def host_rss_bytes() -> int:
    """Resident set size of this process in bytes (0 where /proc is absent).

    Used by the train loop's host-memory guard: PJRT-over-RPC device clients
    (the tunneled dev TPU) have been measured to retain every uploaded host
    literal (~batch-size bytes *per step*, ~34 MB/step at the canonical
    width-10 batch), which OOM-kills multi-hour single-process runs. The
    guard watches this value and checkpoint-restarts before the kernel's
    OOM killer fires."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover - non-Linux
        pass
    return 0


def host_mem_total_bytes() -> int:
    """Physical RAM of the host in bytes (0 where /proc is absent)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover - non-Linux
        pass
    return 0


# re-exec hook for HostMemGuard (tests monkeypatch this; execv never returns)
_EXEC = os.execv


def _mark_fds_cloexec(keep: int = 3) -> int:
    """Mark every fd >= ``keep`` close-on-exec so ``execv`` atomically closes
    them when the new image starts.

    Why: the remote device client opens its tunnel TCP sockets WITHOUT
    CLOEXEC, so a plain ``os.execv`` carries them into the fresh process.
    The device server then still holds the stale session, and the new
    client's handshake blocks forever on the half-open connection — measured
    twice in round 5 (re-exec'd process pinned at ~387 MB RSS, main thread
    in futex_wait, ``axon-conn-read`` in ``tcp_recvmsg``, for 19+ min until
    manually killed; an identical manual relaunch — whose process exit HAD
    closed the old sockets — connected instantly). CLOEXEC (rather than
    closing now) keeps the fds valid until the exec actually happens, so
    nothing in the dying image can crash first. stdio (0-2) is kept.
    Returns the number of fds marked; never raises.
    """
    import fcntl
    n = 0
    try:
        fds = [int(f) for f in os.listdir("/proc/self/fd")]
    except OSError:  # pragma: no cover - non-Linux
        return 0
    for fd in fds:
        if fd < keep:
            continue
        try:
            flags = fcntl.fcntl(fd, fcntl.F_GETFD)
            if not flags & fcntl.FD_CLOEXEC:
                fcntl.fcntl(fd, fcntl.F_SETFD, flags | fcntl.FD_CLOEXEC)
                n += 1
        except OSError:
            pass
    return n


class HostMemGuard:
    """Checkpoint-and-re-exec before a leaky device client OOMs the process.

    Measured on the tunneled PJRT-over-RPC backend: the client retains EVERY
    uploaded host literal (~34 MB/step at the canonical width-10 uint8 batch,
    immune to del/.delete()/gc/buffer reuse), so any multi-hour run is
    OOM-killed (observed: 130 GB anon RSS after ~3.8k steps). Until the
    backend is fixed, the training loops defend themselves: when RSS crosses
    ``guard_mb`` (default 60% of physical RAM; 0 disables) AND has grown by
    at least a quarter of the threshold since this object was built (so a
    legitimately large host footprint cannot trigger a restart storm), the
    caller's ``save`` callback checkpoints the exact position and the process
    re-execs itself — a fresh process gets a fresh client, and auto-resume
    continues the run. Healthy backends never trip it.
    """

    def __init__(self, guard_mb=None, can_restart: bool = True):
        if guard_mb is None:
            self.guard_bytes = int(host_mem_total_bytes() * 0.6)
        else:
            self.guard_bytes = int(guard_mb) * 2**20
        self.rss0 = host_rss_bytes()
        self.can_restart = can_restart
        self.warned = False

    def check(self, save, where: str = "") -> None:
        """Call at a host-synchronized point; ``save`` must checkpoint a
        position auto-resume can continue from. Never returns if it fires."""
        rss = host_rss_bytes()
        if (not self.guard_bytes or rss <= self.guard_bytes
                or rss - self.rss0 < self.guard_bytes // 4):
            return
        if not self.can_restart:
            if not self.warned:
                self.warned = True
                print(f"host-mem guard: rss {rss / 2**30:.1f} GiB exceeds "
                      f"{self.guard_bytes / 2**30:.1f} GiB but restart needs "
                      "checkpointing + auto_resume on a single process; "
                      "continuing unguarded")
            return
        save()
        print(f"host-mem guard: rss {rss / 2**30:.1f} GiB > "
              f"{self.guard_bytes / 2**30:.1f} GiB (grew from "
              f"{self.rss0 / 2**30:.1f}); checkpointed at {where}, "
              "re-exec'ing for a fresh device client", flush=True)
        _mark_fds_cloexec()
        _EXEC(sys.executable, [sys.executable] + sys.argv)


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree) if hasattr(x, "shape"))


def pretty_param_summary(params, max_depth: int = 1) -> str:
    """Per-top-level-module parameter counts (the RichModelSummary analogue,
    reference ``main_pretrain.py:287``)."""
    lines = []
    total = 0
    for k, sub in sorted(params.items()):
        n = param_count(sub)
        total += n
        lines.append(f"  {k:<24s} {n:>12,d}")
    lines.append(f"  {'TOTAL':<24s} {total:>12,d}")
    return "\n".join(lines)
