"""OOM-resilient op execution.

Counterpart of ``detectron2/utils/memory.py:26`` (retry_if_cuda_oom: retry
after cache clear, then CPU fallback). TPU version: on RESOURCE_EXHAUSTED,
retry once (freeing donated buffers via gc), then fall back to the CPU
backend for the wrapped computation.
"""
from __future__ import annotations

import functools
import gc
import logging
from typing import Callable

logger = logging.getLogger(__name__)


def _is_oom(e: Exception) -> bool:
    text = str(e)
    return "RESOURCE_EXHAUSTED" in text or "Out of memory" in text or (
        "Resource exhausted" in text
    )


def retry_if_oom(fn: Callable) -> Callable:
    """Wrap fn: retry once after gc on OOM, then run on CPU."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        import jax

        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError
            if not _is_oom(e):
                raise
        gc.collect()
        try:
            return fn(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
        logger.info("%s: out of device memory, retrying on CPU", fn.__name__)
        cpu = jax.devices("cpu")[0]
        cpu_args = jax.device_put((args, kwargs), cpu)
        with jax.default_device(cpu):
            a, k = cpu_args
            return fn(*a, **k)

    return wrapped
