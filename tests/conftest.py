"""Test config: run everything on a virtual 8-device CPU platform so sharding
logic is exercised fast and deterministically without TPU hardware.

Note: this container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (a remote-TPU tunnel), so editing os.environ here is too
late — we must go through jax.config. XLA_FLAGS is still read lazily at CPU
client creation, so the host-device-count flag works from here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Hard-remove the TPU tunnel backend: merely *initializing* it (which jax
# may do during backend discovery even with jax_platforms=cpu) claims the
# single-client TPU tunnel and starves any real TPU job running alongside.
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
# persistent compile cache: the detection train graph takes minutes to
# compile on CPU; cache hits make repeated pytest runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
