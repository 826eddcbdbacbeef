"""PreciseBN: re-estimate BatchNorm statistics with true averages.

Counterpart of ``detectron2/engine/hooks.py:567`` (PreciseBN, via fvcore's
update_bn_stats): before checkpoints, run N training batches through the
model (no parameter update) and replace the EMA running stats with the TRUE
mean of the per-batch moments.

Implementation note: flax BatchNorm blends ``new = m*old + (1-m)*batch``
with fixed momentum m; we recover each batch's moments algebraically
(``batch = (new - m*old) / (1-m)``) and average them ourselves, so no model
changes are needed.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp

from u2seg_tpu.engine.hooks import HookBase

logger = logging.getLogger(__name__)

BN_MOMENTUM = 0.9  # must match ops.norms.get_norm


def estimate_bn_stats(
    apply_fn: Callable,
    params,
    batch_stats,
    batches: Iterable,
    num_iters: int = 200,
    momentum: float = BN_MOMENTUM,
):
    """Run ``num_iters`` forward passes, return batch_stats holding the true
    average of per-batch moments. ``apply_fn(params, batch_stats, batch) ->
    new_batch_stats`` must run the model in train mode with mutable
    batch_stats (and NOT update params)."""
    acc = jax.tree_util.tree_map(jnp.zeros_like, batch_stats)
    count = 0
    cur = batch_stats
    for batch in batches:
        if count >= num_iters:
            break
        new = apply_fn(params, cur, batch)
        # recover this batch's moments from the EMA update
        batch_moments = jax.tree_util.tree_map(
            lambda n, o: (n - momentum * o) / (1.0 - momentum), new, cur
        )
        acc = jax.tree_util.tree_map(jnp.add, acc, batch_moments)
        cur = new
        count += 1
    if count == 0:
        logger.warning("PreciseBN saw no batches; stats unchanged")
        return batch_stats
    logger.info("PreciseBN: averaged statistics over %d batches", count)
    return jax.tree_util.tree_map(lambda a: a / count, acc)


class PreciseBN(HookBase):
    """Hook: refresh trainer.state.batch_stats every ``period`` iters (and at
    the end of training) using ``num_iters`` loader batches."""

    def __init__(self, period: int, num_iters: int = 200):
        self._period = period
        self._num_iters = num_iters

    def _run(self):
        import dataclasses

        trainer = self.trainer
        model = trainer.model
        mesh = trainer.mesh

        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        from u2seg_tpu.engine.train_loop import batch_from_numpy
        from u2seg_tpu.parallel.mesh import DATA_AXIS, shard_batch

        def body(params, stats, batch):
            _, new_vars = model.apply(
                {"params": params, "batch_stats": stats},
                batch.images, batch.image_sizes,
                gt=batch.gt, sem_seg_gt=batch.sem_seg, train=True,
                rngs={"sampling": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            return jax.lax.pmean(new_vars["batch_stats"], DATA_AXIS)

        mapped = jax.jit(shard_map(
            body, mesh=mesh, in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=P(), check_rep=False,
        ))

        def apply_fn(params, stats, raw_batch):
            b = shard_batch(mesh, batch_from_numpy(raw_batch))
            return mapped(params, stats, b)

        def batches():
            while True:
                yield trainer._next_batch_raw()

        new_stats = estimate_bn_stats(
            apply_fn, trainer.state.params, trainer.state.batch_stats,
            batches(), self._num_iters,
        )
        trainer.state = dataclasses.replace(
            trainer.state, batch_stats=new_stats
        )

    def after_step(self):
        it = self.trainer.iter
        if self._period > 0 and (it + 1) % self._period == 0:
            self._run()

    def after_train(self):
        if self.trainer.iter + 1 >= self.trainer.max_iter:
            self._run()
