"""Rethinking "Batch" in BatchNorm — head-BN experiment variants.

Counterpart of ``projects/Rethinking-BatchNorm`` in the reference: four
Mask R-CNN head-norm recipes (BN / SyncBN / BN-with-batch-stats-at-eval /
cross-replica-shuffled BN), the RetinaNet "shared training BN" head that
normalizes all FPN levels with one set of moments, and domain-specific
statistics recomputation before evaluation.

TPU formulation: cross-replica behavior rides the mesh ``data`` axis name
inside the compiled SPMD step — SyncBN is a ``pmean`` of moments, ShuffleBN
is an ``all_gather`` + a broadcast-consistent permutation + slice (the
reference's dist.broadcast of a randperm), never a host round-trip.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNormBatchStats(nn.Module):
    """BN that normalizes with the CURRENT batch's moments at inference too
    (ref configs/mask_rcnn_BNhead_batch_stats.py BatchNormBatchStat).

    Training behavior is identical to plain BN (so a BN-trained checkpoint
    loads directly: same ``params`` scale/bias + ``batch_stats`` mean/var
    tree); the running stats are maintained but unused at eval.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x32, axes)
        mean2 = jnp.mean(jnp.square(x32), axes)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feats,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feats,))
        )
        if not self.is_initializing() and self.is_mutable_collection(
            "batch_stats"
        ):
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var

        scale = self.param("scale", nn.initializers.ones, (feats,))
        bias = self.param("bias", nn.initializers.zeros, (feats,))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y


def shared_levels_norm(norm_mod, features: Sequence[jnp.ndarray], train: bool):
    """Normalize ALL FPN levels with one set of batch moments
    (ref retinanet_SyncBNhead_SharedTraining.py apply_sequential): flatten
    each (B, H_l, W_l, C) spatially, concatenate, run the norm once, split.
    """
    if norm_mod is None:
        return list(features)
    b = features[0].shape[0]
    c = features[0].shape[-1]
    sizes = [f.shape[1] * f.shape[2] for f in features]
    flat = jnp.concatenate(
        [f.reshape(b, -1, 1, c) for f in features], axis=1
    )
    if isinstance(norm_mod, nn.BatchNorm):
        flat = norm_mod(flat, use_running_average=not train)
    else:
        flat = norm_mod(flat)
    outs = []
    off = 0
    for f, s in zip(features, sizes):
        outs.append(flat[:, off:off + s].reshape(f.shape[:3] + (c,)))
        off += s
    return outs


# ---------------------------------------------------------------------------
# ShuffleBN: decorrelate per-replica statistics by shuffling the global batch
# across replicas before head BN and unshuffling after (MoCo-style; ref
# configs/mask_rcnn_BNhead_shuffle.py batch_shuffle/batch_unshuffle).
# Runs inside shard_map over `axis_name`; the permutation comes from a key
# every replica derives identically, replacing dist.broadcast(randperm).
# ---------------------------------------------------------------------------

def batch_shuffle(x: jnp.ndarray, rng: jax.Array, axis_name: str):
    """Shuffle leading dim across all replicas. Returns (shuffled, perm)."""
    n_dev = jax.lax.psum(1, axis_name)
    b = x.shape[0]
    all_x = jax.lax.all_gather(x, axis_name)          # (n_dev, b, ...)
    total = n_dev * b
    all_x = all_x.reshape((total,) + x.shape[1:])
    perm = jax.random.permutation(rng, total)         # same on every replica
    idx = jax.lax.axis_index(axis_name)
    mine = jax.lax.dynamic_slice_in_dim(perm, idx * b, b)
    return all_x[mine], perm


def batch_unshuffle(y: jnp.ndarray, perm: jnp.ndarray, axis_name: str):
    """Inverse of batch_shuffle: restore each replica's original rows."""
    b = y.shape[0]
    all_y = jax.lax.all_gather(y, axis_name)
    all_y = all_y.reshape((-1,) + y.shape[1:])
    inv = jnp.argsort(perm)
    idx = jax.lax.axis_index(axis_name)
    mine = jax.lax.dynamic_slice_in_dim(inv, idx * b, b)
    return all_y[mine]


def shuffled_bn(norm_mod, x, rng, train: bool, axis_name: str = "data"):
    """Apply a per-replica BN on a cross-replica-shuffled batch (training);
    plain running-stats BN at inference (ref wrap_shuffle)."""
    if not train:
        return norm_mod(x, use_running_average=True)
    x, perm = batch_shuffle(x, rng, axis_name)
    x = norm_mod(x, use_running_average=False)
    return batch_unshuffle(x, perm, axis_name)


# ---------------------------------------------------------------------------
# Recipes: the reference's lazy configs as Config transforms.
# ---------------------------------------------------------------------------

def mask_rcnn_bn_head(cfg=None):
    """configs/mask_rcnn_BNhead.py: 4conv1fc box head + BN in both heads."""
    from u2seg_tpu.config.config import Config

    cfg = cfg or Config()
    cfg.model.roi_heads.box_head.num_conv = 4
    cfg.model.roi_heads.box_head.num_fc = 1
    cfg.model.roi_heads.box_head.norm = "BN"
    cfg.model.roi_heads.mask_head.norm = "BN"
    return cfg


def mask_rcnn_syncbn_head(cfg=None):
    """configs/mask_rcnn_SyncBNhead.py."""
    cfg = mask_rcnn_bn_head(cfg)
    cfg.model.roi_heads.box_head.norm = "SyncBN"
    cfg.model.roi_heads.mask_head.norm = "SyncBN"
    return cfg


def mask_rcnn_bn_head_batch_stats(cfg=None):
    """configs/mask_rcnn_BNhead_batch_stats.py: train like BN, eval with
    batch stats. Train with mask_rcnn_bn_head; evaluate with this."""
    cfg = mask_rcnn_bn_head(cfg)
    cfg.model.roi_heads.box_head.norm = "BNBatchStats"
    cfg.model.roi_heads.mask_head.norm = "BNBatchStats"
    return cfg


def retinanet_syncbn_head(cfg=None, shared_training: bool = False):
    """configs/retinanet_SyncBNhead.py (+_SharedTraining): RetinaNet config
    with SyncBN in the head towers; ``shared_training`` normalizes all FPN
    levels with one set of moments."""
    from u2seg_tpu.models.dense_detector import RetinaNetConfig

    cfg = cfg or RetinaNetConfig()
    cfg.head_norm = "SyncBN"
    cfg.head_shared_bn = shared_training
    return cfg


def recompute_domain_stats(apply_fn, params, batch_stats, batches,
                           num_iters: int = 100):
    """retinanet-eval-domain-specific.py: before evaluating on a domain,
    re-estimate every BN's running statistics from that domain's images
    (the paper's domain-specific-stats protocol). Thin wrapper over
    engine.precise_bn (same true-average machinery as PreciseBN)."""
    from u2seg_tpu.engine.precise_bn import estimate_bn_stats

    return estimate_bn_stats(apply_fn, params, batch_stats, batches,
                             num_iters=num_iters)
