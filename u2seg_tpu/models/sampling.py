"""Fixed-size random fg/bg sampling for RPN anchors and ROI proposals.

TPU-first counterpart of the reference ``detectron2/modeling/sampling.py:9``
(``subsample_labels``). The reference returns variable-length index tensors;
on TPU we instead return a fixed-size (num_samples,) index vector plus masks,
selecting a random subset via randomized top-k (sorting random keys), which is
statically shaped and jit-compatible.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def subsample_labels(
    rng: jax.Array,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample up to ``num_samples`` elements with at most
    ``positive_fraction`` positives; negatives fill the remainder.

    Semantics follow ref sampling.py:9: positives are labels==1, negatives
    labels==0, ignored labels==-1 never sampled. If there are fewer positives
    (negatives) than requested, all are taken and the other kind fills up.

    Returns:
      idx: (num_samples,) int32 indices into ``labels`` (arbitrary where the
        sample slot is unused).
      is_valid: (num_samples,) bool — slot holds a real sampled element.
      is_positive: (num_samples,) bool — slot holds a sampled positive.
    """
    n = labels.shape[0]
    pos_mask = labels == 1
    neg_mask = labels == 0
    num_pos_avail = jnp.sum(pos_mask)
    num_neg_avail = jnp.sum(neg_mask)

    num_pos_target = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(num_pos_target, num_pos_avail)
    num_neg = jnp.minimum(num_samples - num_pos, num_neg_avail)

    kp, kn = jax.random.split(rng)
    # Random keys: valid candidates get uniform keys, others -inf → sorted last.
    pos_keys = jnp.where(pos_mask, jax.random.uniform(kp, (n,)), -1.0)
    neg_keys = jnp.where(neg_mask, jax.random.uniform(kn, (n,)), -1.0)

    # only the first num_samples entries of each order are ever indexed —
    # top_k(256) over ~268k anchor keys is far cheaper than a full argsort
    kcap = min(num_samples, n)
    _, pos_order = jax.lax.top_k(pos_keys, kcap)  # best (valid random) first
    _, neg_order = jax.lax.top_k(neg_keys, kcap)

    # Fixed-size layout: first num_pos_target slots reserved for positives,
    # rest for negatives; unused pos slots can be backfilled by negatives.
    slot = jnp.arange(num_samples)
    # positives occupy slots [0, num_pos)
    pos_idx = pos_order[jnp.minimum(slot, kcap - 1)]
    is_pos_slot = slot < num_pos
    # negatives occupy slots [num_pos, num_pos+num_neg)
    neg_rank = jnp.clip(slot - num_pos, 0, kcap - 1)
    neg_idx = neg_order[neg_rank]
    is_neg_slot = (slot >= num_pos) & (slot < num_pos + num_neg)

    idx = jnp.where(is_pos_slot, pos_idx, neg_idx).astype(jnp.int32)
    is_valid = is_pos_slot | is_neg_slot
    return idx, is_valid, is_pos_slot
