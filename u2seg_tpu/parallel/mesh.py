"""Device mesh & sharding helpers.

TPU-native replacement for the reference's distributed runtime
(``detectron2/engine/launch.py:27`` process-spawn + NCCL init and
``detectron2/utils/comm.py`` wrappers). There is no "backend object": one
``jax.sharding.Mesh`` with a ``data`` axis (DP over ICI), gradients and
BN statistics reduced by ``psum`` inside the compiled step, eval results
gathered with ``process_allgather``.

The reference's only parallelism is DDP data parallelism (SURVEY.md §2.2);
the mesh here carries an optional second ``model`` axis so tensor-style
sharding can be layered on later without API changes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallelism: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (data, model); model defaults to 1 (pure DP)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % model_parallelism == 0, (n, model_parallelism)
    arr = np.asarray(devs).reshape(n // model_parallelism, model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host pytree with batch-dim sharding."""
    return jax.device_put(batch, data_sharding(mesh))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
