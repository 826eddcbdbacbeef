"""Map train-step HLO op names to source locations."""
from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NAMES = sys.argv[1:] or [
    "while.58", "while.56", "while.55", "fusion.5286", "fusion.5277",
    "fusion.5268", "fusion.48", "fusion.5259", "fusion.34", "fusion.31",
    "fusion.2915", "sort.16", "sort.22", "custom-call",
    "convolution_add_fusion.2", "fusion.2373", "select-and-scatter.1",
    "fusion.2116", "fusion.390", "sort.54", "add_reduce_fusion",
]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

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
    bt_s = shard_batch(mesh, bt)
    key = jax.random.PRNGKey(1)

    txt = step.lower(state, bt_s, key).compile().as_text()
    for name in NAMES:
        m = re.search(rf"%{re.escape(name)} = ([^\n]*)", txt)
        if not m:
            print(f"{name}: NOT FOUND")
            continue
        line = m.group(1)
        shape = line.split(" ")[0]
        om = re.search(r'op_name="([^"]*)"', line)
        sf = re.search(r'source_file="([^"]*)" source_line=(\d+)', line)
        print(f"{name}: {shape[:90]}")
        print(f"   op={om.group(1)[:130] if om else '?'}")
        if sf:
            print(f"   at {sf.group(1).split('/')[-1]}:{sf.group(2)}")


if __name__ == "__main__":
    main()
