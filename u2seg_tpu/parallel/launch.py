"""Multi-host launch helper.

Counterpart of ``detectron2/engine/launch.py:27`` (per-GPU process spawn +
NCCL init). On TPU there is no process-spawning: the scheduler starts one
process per host; this helper initializes ``jax.distributed`` (DCN
coordination) and returns the mesh spanning every chip in the slice.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Optional

logger = logging.getLogger(__name__)


def launch(
    main_func: Callable,
    *,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    args: tuple = (),
):
    """Initialize multi-host jax and invoke ``main_func(*args)``.

    Single-host (the common dev case): no-op initialization. Multi-host:
    reads coordinator/process info from arguments or the standard
    environment (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``; on Cloud TPU ``jax.distributed.initialize()``
    auto-discovers these from the metadata server).
    """
    import jax

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in os.environ
        else None
    )
    if coord or nproc or os.environ.get("TPU_WORKER_HOSTNAMES_MULTIHOST"):
        logger.info(
            "initializing jax.distributed (coordinator=%s, %s processes)",
            coord, nproc,
        )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=pid,
        )
    logger.info(
        "process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return main_func(*args)
