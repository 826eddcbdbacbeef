"""Training step & loop.

Counterpart of ``detectron2/engine/train_loop.py`` (SimpleTrainer.run_step
:288-339, AMPTrainer :437) and the DDP wiring in ``defaults.py:60-79`` —
TPU-native: ONE compiled SPMD train step via ``shard_map`` over the mesh's
``data`` axis. Inside the step: forward (losses), backward, ``psum`` of
gradients (the DDP all-reduce), SGD update — all fused by XLA. SyncBN works
for free because the step body binds the ``data`` axis name.

AMP: on TPU, "AMP" is bf16 activations; params/optimizer state stay f32.
The loss-scale machinery of AMPTrainer is unnecessary with bf16.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax.sharding import NamedSharding, PartitionSpec as P

from u2seg_tpu.config.config import Config
from u2seg_tpu.models.panoptic_fpn import PanopticFPN
from u2seg_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from u2seg_tpu.structures.instances import GtInstances


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Batch:
    """One global training batch (leading dim = global batch size)."""

    images: jnp.ndarray        # (B, H, W, 3) raw RGB
    image_sizes: jnp.ndarray   # (B, 2)
    gt: GtInstances            # batched, fixed capacity
    sem_seg: jnp.ndarray       # (B, H, W) int32


def create_train_state(
    cfg: Config, rng: jax.Array, sample_batch: Batch, tx: optax.GradientTransformation
) -> Tuple[PanopticFPN, TrainState]:
    model = PanopticFPN(cfg.model)
    p_rng, s_rng = jax.random.split(rng)
    variables = model.init(
        {"params": p_rng, "sampling": s_rng},
        sample_batch.images[:1],
        sample_batch.image_sizes[:1],
        gt=jax.tree_util.tree_map(lambda x: x[:1], sample_batch.gt),
        sem_seg_gt=sample_batch.sem_seg[:1],
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return model, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    model: PanopticFPN,
    tx: optax.GradientTransformation,
    mesh,
    donate: bool = True,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the compiled SPMD train step.

    Sharding: state replicated, batch split on the ``data`` axis. Gradients
    and metrics are psum/pmean-ed across the axis inside the step.
    """

    def loss_fn(params, batch_stats, batch: Batch, rng):
        outputs, new_vars = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.images, batch.image_sizes,
            gt=batch.gt, sem_seg_gt=batch.sem_seg, train=True,
            rngs={"sampling": rng},
            mutable=["batch_stats"],
        )
        losses = outputs
        total = sum(losses.values())
        return total, (losses, new_vars.get("batch_stats", batch_stats))

    def step_body(state: TrainState, batch: Batch, rng: jax.Array):
        # per-device rng: fold in the data-axis index so sampling differs
        idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(jax.random.fold_in(rng, idx), state.step)
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)

        grads = jax.lax.pmean(grads, DATA_AXIS)          # DDP all-reduce
        losses = jax.lax.pmean(losses, DATA_AXIS)
        total = jax.lax.pmean(total, DATA_AXIS)
        # flax BatchNorm with axis_name already syncs batch stats in-graph;
        # pmean here makes every replica's stored stats bit-identical.
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    from jax.experimental.shard_map import shard_map

    state_spec = P()            # replicated
    batch_spec = P(DATA_AXIS)   # batch-dim sharded
    mapped = shard_map(
        step_body,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, P()),
        out_specs=(state_spec, state_spec),
        check_rep=False,
    )

    # pin shardings explicitly: without them, the output state's sharding
    # objects don't compare equal to fresh inputs' and every call RECOMPILES
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    step = jax.jit(
        mapped,
        in_shardings=(state_sh, batch_sh, state_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate else (),
    )
    return step


def make_eval_step(model: PanopticFPN, mesh, combine: bool = True):
    """Compiled SPMD inference step: batch sharded on data axis."""
    from jax.experimental.shard_map import shard_map

    def body(params, batch_stats, images, image_sizes):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, image_sizes, train=False, combine=combine,
        )

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        mapped, in_shardings=(rep, rep, dat, dat), out_shardings=dat
    )
