"""Cross-process communication helpers.

Counterpart of ``detectron2/utils/comm.py`` (get_world_size :21,
all_gather :138, gather :163, reduce_dict :209, shared_random_seed :195).
On TPU there is no backend object: in-graph reduction is ``psum`` inside the
compiled step; these helpers cover the HOST side — rank queries and
gathering python objects (eval predictions) across processes via
``jax.experimental.multihost_utils``.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional

import numpy as np


def get_world_size() -> int:
    import jax

    return jax.process_count()


def get_rank() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across processes (ref comm.py:106)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("u2seg_tpu_sync")


def all_gather(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (ref comm.py:138 — pickle over the object-store; here: pickle to a
    uint8 array, pad to the global max length, process_allgather)."""
    world = get_world_size()
    if world == 1:
        return [data]
    import jax
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    length = np.array([len(blob)], np.int64)
    all_len = multihost_utils.process_allgather(length)
    max_len = int(np.max(all_len))
    padded = np.zeros(max_len, np.uint8)
    padded[: len(blob)] = blob
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(world):
        n = int(np.asarray(all_len).reshape(world)[i])
        out.append(pickle.loads(bytes(np.asarray(gathered)[i, :n])))
    return out


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather to one process (others get []). TPU collectives are
    all-to-all by nature, so this is all_gather + filtering (ref :163)."""
    everyone = all_gather(data)
    return everyone if get_rank() == dst else []


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Mean/sum a dict of scalars across processes (ref comm.py:209)."""
    world = get_world_size()
    if world == 1:
        return dict(d)
    keys = sorted(d)
    from jax.experimental import multihost_utils

    vals = np.array([float(d[k]) for k in keys], np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(vals))
    total = gathered.sum(axis=0)
    if average:
        total = total / world
    return dict(zip(keys, total.tolist()))


def shared_random_seed() -> int:
    """A seed shared by all processes (ref comm.py:195)."""
    seed = np.random.randint(2 ** 31)
    return int(all_gather(seed)[0])
