"""Environment & reproducibility utilities.

Counterpart of ``detectron2/utils/env.py`` (seed_all_rng :27) and
``collect_env.py`` (collect_env_info :55).
"""
from __future__ import annotations

import datetime
import os
import random
import sys
from typing import Optional

import numpy as np


def seed_all_rng(seed: Optional[int] = None) -> int:
    """Seed python/numpy RNGs (jax RNG is explicit-key based and is derived
    from the config seed in the trainer). Returns the seed used."""
    if seed is None or seed < 0:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        ) % (2 ** 31)
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def collect_env_info() -> str:
    import jax

    lines = [
        f"sys.platform: {sys.platform}",
        f"Python: {sys.version.replace(os.linesep, ' ')}",
        f"numpy: {np.__version__}",
        f"jax: {jax.__version__}",
    ]
    try:
        import jaxlib

        lines.append(f"jaxlib: {jaxlib.__version__}")
    except Exception:
        pass
    try:
        import flax
        import optax

        lines.append(f"flax: {flax.__version__}")
        lines.append(f"optax: {optax.__version__}")
    except Exception:
        pass
    try:
        devs = jax.devices()
        lines.append(f"devices: {[str(d) for d in devs]}")
        lines.append(f"process_count: {jax.process_count()}")
    except Exception as e:
        lines.append(f"devices: unavailable ({e})")
    from u2seg_tpu import _native

    lines.append(f"native rle_ops: {'built' if _native.available() else 'unavailable'}")
    return "\n".join(lines)
