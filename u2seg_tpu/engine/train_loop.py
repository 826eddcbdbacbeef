"""Hook-driven training loop.

Counterpart of ``detectron2/engine/train_loop.py`` (TrainerBase :94,
SimpleTrainer :226 — here the "step" is the single compiled SPMD function
from ``engine.trainer.make_train_step``; metrics gathering is one host
transfer of the already-pmean'd loss dict) and of ``engine/defaults.py``
(DefaultTrainer :324): ``DefaultTrainer.from_config`` wires model, data,
optimizer, checkpointer and hooks from a Config.
"""
from __future__ import annotations

import logging
import math
import os
import weakref
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

from u2seg_tpu.config.config import Config
from u2seg_tpu.engine import hooks as hooks_lib
from u2seg_tpu.engine.checkpoint import Checkpointer
from u2seg_tpu.engine.events import (
    CommonMetricPrinter, EventStorage, JSONWriter,
)
from u2seg_tpu.engine.trainer import (
    Batch, TrainState, create_train_state, make_train_step,
)
from u2seg_tpu.parallel.mesh import create_mesh, shard_batch
from u2seg_tpu.solver import build_lr_schedule, build_optimizer
from u2seg_tpu.structures.instances import GtInstances

logger = logging.getLogger(__name__)


class TrainerBase:
    def __init__(self):
        self._hooks: List[hooks_lib.HookBase] = []
        self.iter = 0
        self.start_iter = 0
        self.max_iter = 0
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks: Iterable[Optional[hooks_lib.HookBase]]):
        for h in hooks:
            if h is None:
                continue
            h.trainer = weakref.proxy(self)
            self._hooks.append(h)

    def train(self, start_iter: int, max_iter: int):
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter
        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for self.iter in range(start_iter, max_iter):
                    self.storage.iter = self.iter
                    self.before_step()
                    self.run_step()
                    self.after_step()
                self.iter += 1
            finally:
                self.after_train()

    def before_train(self):
        for h in self._hooks:
            h.before_train()

    def after_train(self):
        if self.storage is not None:
            self.storage.iter = self.iter
        for h in self._hooks:
            h.after_train()

    def before_step(self):
        for h in self._hooks:
            h.before_step()

    def after_step(self):
        for h in self._hooks:
            h.after_step()

    def run_step(self):
        raise NotImplementedError

    def state_dict(self):
        return {
            "iteration": self.iter,
            "hooks": {
                type(h).__name__: h.state_dict()
                for h in self._hooks if h.state_dict()
            },
        }


def batch_from_numpy(b: dict) -> Batch:
    """Stacked mapper output -> Batch pytree."""
    return Batch(
        images=b["image"],
        image_sizes=b["image_size"],
        gt=GtInstances(
            boxes=b["gt_boxes"], classes=b["gt_classes"],
            valid=b["gt_valid"], masks=b.get("gt_masks"),
        ),
        sem_seg=b.get("sem_seg", np.zeros(b["image"].shape[:3], np.int32)),
    )


class DefaultTrainer(TrainerBase):
    """Config-driven SPMD trainer.

    Differences from the reference DefaultTrainer: no DDP wrapper (the train
    step is pjit'ed over the mesh), no AMP scaler (bf16 is native), metrics
    come back already cross-replica-averaged.
    """

    def __init__(self, cfg: Config, data_loader: Iterable[dict],
                 mesh=None, sample_batch: Optional[dict] = None):
        super().__init__()
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh()
        self._loader = iter(data_loader)
        if sample_batch is None:
            sample_batch = next(self._loader)
            self._pending = [sample_batch]
        else:
            self._pending = []
        sb = batch_from_numpy(sample_batch)

        self.tx = build_optimizer(cfg.solver)
        self.schedule = build_lr_schedule(cfg.solver)
        seed = cfg.seed if cfg.seed >= 0 else 0
        self.model, self.state = create_train_state(
            cfg, jax.random.PRNGKey(seed), sb, self.tx
        )
        # replicate the train state across the mesh so it composes with the
        # batch's data-axis sharding inside the jitted step
        from u2seg_tpu.parallel.mesh import replicated

        self.state = jax.device_put(self.state, replicated(self.mesh))
        self.step_fn = make_train_step(self.model, self.tx, self.mesh)
        self._rng = jax.random.PRNGKey(seed + 1)
        self.checkpointer = Checkpointer(cfg.output_dir)

    # -- checkpoint plumbing ------------------------------------------
    def save_state(self):
        return {"state": self.state, "iteration": self.iter}

    def resume_or_load(self, resume: bool = True):
        target = {"state": self.state, "iteration": 0}
        restored, resumed = self.checkpointer.resume_or_load(target, resume)
        if resumed:
            self.state = restored["state"]
            self.start_iter = int(restored["iteration"]) + 1
        return resumed

    # -- loop ---------------------------------------------------------
    def _next_batch_raw(self) -> dict:
        if self._pending:
            return self._pending.pop()
        return next(self._loader)

    def _next_batch(self) -> Batch:
        return batch_from_numpy(self._next_batch_raw())

    def run_step(self):
        batch = self._next_batch()
        batch = shard_batch(self.mesh, batch)
        self.state, metrics = self.step_fn(self.state, batch, self._rng)
        # one host transfer; losses are already pmean'd in-graph
        metrics = {k: float(v) for k, v in metrics.items()}
        if not math.isfinite(metrics.get("total_loss", 0.0)):
            raise FloatingPointError(
                f"Loss became infinite or NaN at iteration={self.iter}! "
                f"metrics={metrics}"
            )
        self.storage.put_scalars(**metrics, smoothing_hint=True)

    def build_hooks(self) -> List[hooks_lib.HookBase]:
        cfg = self.cfg
        writers = [
            CommonMetricPrinter(cfg.solver.max_iter),
            JSONWriter(os.path.join(cfg.output_dir, "metrics.json")),
        ]
        return [
            hooks_lib.IterationTimer(),
            hooks_lib.LRLogger(self.schedule),
            hooks_lib.PeriodicCheckpointer(
                self.checkpointer, cfg.solver.checkpoint_period
            ),
            hooks_lib.PeriodicWriter(writers, period=20),
        ]

    def train(self, max_iter: Optional[int] = None):
        max_iter = max_iter or self.cfg.solver.max_iter
        super().train(self.start_iter, max_iter)


def auto_scale_workers(cfg: Config, num_workers: int) -> Config:
    """Scale LR/iters when the worker count differs from the reference 8-GPU
    recipe (ref defaults.py:635 auto_scale_workers). Returns a new Config."""
    import dataclasses

    old_world = 8
    if num_workers == old_world:
        return cfg
    scale = num_workers / old_world
    s = cfg.solver
    new_solver = dataclasses.replace(
        s,
        base_lr=s.base_lr * scale,
        max_iter=int(round(s.max_iter / scale)),
        warmup_iters=int(round(s.warmup_iters / scale)),
        steps=tuple(int(round(x / scale)) for x in s.steps),
    )
    return dataclasses.replace(cfg, solver=new_solver)
