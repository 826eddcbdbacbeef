"""Device-trace the training step and rank HLO ops by time."""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("device:", jax.devices()[0].device_kind, flush=True)

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.trainer import Batch, create_train_state, make_train_step
    from u2seg_tpu.parallel.mesh import create_mesh, shard_batch, replicated
    from u2seg_tpu.solver import build_optimizer
    from u2seg_tpu.structures.instances import GtInstances

    cfg = Config()
    mesh = create_mesh()
    b, h, w = 2, 800, 1344
    rng = np.random.RandomState(0)
    g, patch = 20, 64
    xy = rng.rand(b, g, 2) * (h / 2)
    wh = rng.rand(b, g, 2) * (h / 3) + 8
    bt = Batch(
        images=jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        image_sizes=jnp.array([[h, w]] * b, jnp.int32),
        gt=GtInstances(
            boxes=jnp.array(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            classes=jnp.array(rng.randint(
                0, cfg.model.roi_heads.num_classes, (b, g)).astype(np.int32)),
            valid=jnp.ones((b, g), bool),
            masks=jnp.array((rng.rand(b, g, patch, patch) > 0.4).astype(np.float32)),
        ),
        sem_seg=jnp.array(rng.randint(
            0, cfg.model.sem_seg_head.num_classes, (b, h, w)).astype(np.int32)),
    )
    tx = build_optimizer(cfg.solver)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), bt, tx)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, mesh, donate=False)
    bt = shard_batch(mesh, bt)
    key = jax.random.PRNGKey(1)

    state, m = step(state, bt, key)
    jax.block_until_ready(m)

    with jax.profiler.trace("/tmp/jtrace_train"):
        for _ in range(3):
            state, m = step(state, bt, key)
        jax.block_until_ready(m)

    d = sorted(glob.glob("/tmp/jtrace_train/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(d) as fh:
        tr = json.load(fh)
    ev = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
    by = collections.Counter()
    fam = collections.Counter()
    total = 0
    for e in ev:
        n = e.get("name", "?")
        if n.startswith("$") or "trace" in n or n.startswith("jit_") or \
                n.startswith("Pjit"):
            continue
        by[n[:60]] += e.get("dur", 0)
        fam[n.split(".")[0]] += e.get("dur", 0)
        total += e.get("dur", 0)
    print(f"total device op time: {total / 3e3:.2f} ms/step")
    for name, dur in by.most_common(30):
        print(f"{dur / 3e3:8.3f} ms  {name}")
    print("--- families ---")
    for name, dur in fam.most_common(15):
        print(f"{dur / 3e3:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
