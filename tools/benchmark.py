#!/usr/bin/env python
"""Throughput benchmarks: train step / inference / dataloader.

Counterpart of the reference ``tools/benchmark.py`` (benchmark_train /
benchmark_eval / benchmark_data) and ``detectron2/data/benchmark.py:65``.
Runs on whatever platform jax selects (the TPU under the driver).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def benchmark_eval(cfg, iters=20, batch=4, h=800, w=1344):
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.models.build import build_model

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(batch, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w]] * batch, jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           images[:1], sizes[:1], train=False)

    @jax.jit
    def fwd(v, im, sz):
        out = model.apply(v, im, sz, train=False, combine=True)
        return out.detections.boxes, out.panoptic

    t0 = time.perf_counter()
    jax.block_until_ready(fwd(variables, images, sizes))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images, sizes)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "imgs_per_sec": batch * iters / dt,
        "sec_per_batch": dt / iters,
        "compile_sec": compile_s,
    }


def benchmark_train(cfg, iters=10, batch=None, h=800, w=1344):
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.engine.trainer import Batch, create_train_state, make_train_step
    from u2seg_tpu.parallel.mesh import create_mesh, shard_batch
    from u2seg_tpu.solver import build_optimizer
    from u2seg_tpu.structures.instances import GtInstances

    mesh = create_mesh()
    n_dev = mesh.devices.size
    b = batch or 2 * n_dev   # 2 imgs/chip (the reference recipe's density)
    rng = np.random.RandomState(0)
    g, patch = 20, 64
    xy = rng.rand(b, g, 2) * (h / 2)
    wh = rng.rand(b, g, 2) * (h / 3) + 8
    bt = Batch(
        images=jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        image_sizes=jnp.array([[h, w]] * b, jnp.int32),
        gt=GtInstances(
            boxes=jnp.array(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            classes=jnp.array(
                rng.randint(0, cfg.model.roi_heads.num_classes, (b, g)).astype(np.int32)
            ),
            valid=jnp.ones((b, g), bool),
            masks=jnp.array((rng.rand(b, g, patch, patch) > 0.4).astype(np.float32)),
        ),
        sem_seg=jnp.array(
            rng.randint(0, cfg.model.sem_seg_head.num_classes, (b, h, w)).astype(np.int32)
        ),
    )
    tx = build_optimizer(cfg.solver)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), bt, tx)
    from u2seg_tpu.parallel.mesh import replicated

    state = jax.device_put(state, replicated(mesh))
    # donate=False: buffer donation through the remote tunnel backend forces
    # a full state round-trip per step (~100x slowdown); on directly-attached
    # TPUs donation is the right default (see DefaultTrainer)
    step = make_train_step(model, tx, mesh, donate=False)
    bt = shard_batch(mesh, bt)
    key = jax.random.PRNGKey(1)

    def sync(metrics):
        return float(np.asarray(metrics["total_loss"]))

    t0 = time.perf_counter()
    state, m = step(state, bt, key)
    sync(m)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, bt, key)
    sync(m)
    dt = time.perf_counter() - t0
    return {
        "imgs_per_sec": b * iters / dt,
        "sec_per_iter": dt / iters,
        "compile_sec": compile_s,
    }


def benchmark_data(cfg, iters=50):
    from u2seg_tpu.data.builtin import register_all_coco
    from u2seg_tpu.data.catalog import DatasetCatalog
    from u2seg_tpu.data.loader import build_detection_train_loader
    from u2seg_tpu.data.mapper import DatasetMapper

    register_all_coco(cfg.datasets.root, cluster_num=cfg.datasets.cluster_num)
    dicts = []
    for name in cfg.datasets.train:
        dicts.extend(DatasetCatalog.get(name))
    mapper = DatasetMapper(cfg, is_train=True)
    loader = build_detection_train_loader(
        dicts, mapper, total_batch_size=cfg.solver.ims_per_batch,
        num_workers=cfg.dataloader.num_workers,
    )
    it = iter(loader)
    next(it)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        next(it)
    dt = time.perf_counter() - t0
    return {"batches_per_sec": iters / dt}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--task", default="eval",
                        choices=["train", "eval", "data"])
    parser.add_argument("--iters", type=int, default=0)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from u2seg_tpu.config.config import load_config

    cfg = load_config(args.config_file or None,
                      [o for o in args.opts if "=" in o])
    fn = {"train": benchmark_train, "eval": benchmark_eval,
          "data": benchmark_data}[args.task]
    kwargs = {"iters": args.iters} if args.iters else {}
    print(args.task, fn(cfg, **kwargs))


if __name__ == "__main__":
    main()
