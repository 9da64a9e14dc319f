"""Multi-host initialization (SURVEY §5.8: DCN between slices).

For multi-host slices (the driver's ``train_v4-32_dp`` config), JAX needs
``jax.distributed.initialize`` before first device use; afterwards
``jax.devices()`` spans every host and the same ``shard_map`` DP step runs
unchanged — XLA routes intra-slice collectives over ICI and inter-slice
over DCN. Single-host (and the CI CPU mesh) skips initialization entirely.

Idempotent: safe to call from every entrypoint.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-host env is detected.

    Detection: explicit BASI_COORDINATOR/BASI_NUM_PROCESSES/BASI_PROCESS_ID
    env vars, or the standard cloud-TPU env (JAX auto-detects args there).
    Returns True when distributed mode is active.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("BASI_COORDINATOR")
    nproc = os.environ.get("BASI_NUM_PROCESSES")
    pid = os.environ.get("BASI_PROCESS_ID")
    if coord and nproc and pid:
        _init(coordinator_address=coord, num_processes=int(nproc),
              process_id=int(pid))
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
        # Multi-worker TPU pod slice: JAX infers everything.
        _init()
        return True
    return False


def _init(**kwargs) -> None:
    """jax.distributed.initialize, idempotent against EXTERNAL init too: a
    launcher framework (or a module reload) may already have initialized
    the runtime — re-initializing raises 'already initialized', which for
    our purposes means success."""
    global _initialized
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    _initialized = True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when not distributed."""
    return jax.process_index(), jax.process_count()
