#!/usr/bin/env python
"""Minimal hand-written training loop (no Trainer/hooks).

Counterpart of the reference ``tools/plain_train_net.py``: for users who
want an explicit loop to customize. Everything here is plain code against
the library surface — no hook system, no DefaultTrainer.
"""
from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger("plain_train_net")


def do_train(cfg, max_iter=None, resume=False):
    import jax

    from u2seg_tpu.engine.checkpoint import Checkpointer
    from u2seg_tpu.engine.events import (
        CommonMetricPrinter, EventStorage, JSONWriter,
    )
    from u2seg_tpu.engine.trainer import create_train_state, make_train_step
    from u2seg_tpu.engine.train_loop import batch_from_numpy
    from u2seg_tpu.parallel.mesh import create_mesh, shard_batch
    from u2seg_tpu.solver import build_lr_schedule, build_optimizer
    from tools.train_net import build_train_loader

    mesh = create_mesh()
    loader = build_train_loader(cfg, mesh)
    it = iter(loader)
    first = next(it)

    tx = build_optimizer(cfg.solver)
    schedule = build_lr_schedule(cfg.solver)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(max(cfg.seed, 0)), batch_from_numpy(first), tx
    )
    step = make_train_step(model, tx, mesh)
    ckptr = Checkpointer(cfg.output_dir)
    start_iter = 0
    if resume and ckptr.has_checkpoint():
        restored, _ = ckptr.resume_or_load({"state": state, "iteration": 0})
        state = restored["state"]
        start_iter = int(restored["iteration"]) + 1

    max_iter = max_iter or cfg.solver.max_iter
    writers = [
        CommonMetricPrinter(max_iter),
        JSONWriter(os.path.join(cfg.output_dir, "metrics.json")),
    ]
    rng = jax.random.PRNGKey(max(cfg.seed, 0) + 1)
    pending = first
    with EventStorage(start_iter) as storage:
        for iteration in range(start_iter, max_iter):
            storage.iter = iteration
            raw = pending if pending is not None else next(it)
            pending = None
            batch = shard_batch(mesh, batch_from_numpy(raw))
            state, metrics = step(state, batch, rng)
            storage.put_scalars(
                **{k: float(v) for k, v in metrics.items()}
            )
            storage.put_scalar("lr", float(schedule(iteration)),
                               smoothing_hint=False)
            if (iteration + 1) % 20 == 0:
                for w in writers:
                    w.write(storage)
            if (iteration + 1) % cfg.solver.checkpoint_period == 0 or (
                iteration == max_iter - 1
            ):
                ckptr.save(f"model_{iteration:07d}",
                           {"state": state, "iteration": iteration})
    return state


def main():
    from tools.train_net import default_argument_parser, setup

    args = default_argument_parser().parse_args()
    cfg = setup(args)
    do_train(cfg, max_iter=args.max_iter or None, resume=args.resume)


if __name__ == "__main__":
    main()
