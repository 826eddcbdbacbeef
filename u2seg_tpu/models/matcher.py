"""Anchor/proposal-to-GT matching, fully vectorized for static shapes.

TPU-first counterpart of the reference ``detectron2/modeling/matcher.py:9``.
Instead of producing variable-length index lists, works on fixed (N_gt, N_pred)
quality matrices with a ``gt_valid`` mask, returning per-prediction matched gt
index and a label in {-1 ignore, 0 negative, 1 positive}.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def match(
    quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match predictions to ground truth by max quality (IoU).

    Args:
      quality: (N_gt, N_pred) pairwise quality (IoU). Rows for invalid gt are
        ignored via ``gt_valid``.
      gt_valid: (N_gt,) bool mask of real gt rows.
      thresholds: ascending thresholds, e.g. (0.3, 0.7) for RPN.
      labels: len(thresholds)+1 values in {-1, 0, 1} for each interval
        (ref matcher.py:32: intervals are (-inf,t0), [t0,t1), ..., [tk,inf)).
      allow_low_quality_matches: for each valid gt, also mark as positive all
        predictions achieving that gt's max quality (ref matcher.py:96
        ``set_low_quality_matches_``, including the documented quirk that ties
        at the per-gt max promote every tied prediction).

    Returns:
      matched_idx: (N_pred,) int32 index of best gt (0 if no valid gt).
      match_labels: (N_pred,) int8 in {-1, 0, 1}.
    """
    assert len(labels) == len(thresholds) + 1
    neg_inf = jnp.asarray(-1.0, quality.dtype)
    q = jnp.where(gt_valid[:, None], quality, neg_inf)  # invalid gt never wins

    matched_idx = jnp.argmax(q, axis=0).astype(jnp.int32)
    matched_vals = jnp.max(q, axis=0)
    any_valid = jnp.any(gt_valid)

    match_labels = jnp.full(matched_vals.shape, labels[0], dtype=jnp.int8)
    th = list(thresholds)
    for lab, lo in zip(labels[1:], th):
        match_labels = jnp.where(
            matched_vals >= lo, jnp.int8(lab), match_labels
        )

    if allow_low_quality_matches:
        # per-gt max over predictions; every pred achieving it becomes positive
        per_gt_max = jnp.max(q, axis=1, keepdims=True)  # (N_gt, 1)
        # NOTE: no per_gt_max > 0 guard — the reference promotes every
        # prediction tied at a gt's max even when that max is 0 (a gt
        # overlapping nothing marks ALL predictions positive; verified
        # against matcher.py:96 via tests/golden/fixtures/matcher.npz)
        is_best = (q >= per_gt_max) & gt_valid[:, None]
        pred_is_low_quality = jnp.any(is_best, axis=0)
        match_labels = jnp.where(pred_is_low_quality, jnp.int8(1), match_labels)

    # With no valid gt at all: everything is background (label 0 interval
    # handling in the reference yields all-negative since IoU row is empty).
    match_labels = jnp.where(any_valid, match_labels, jnp.int8(labels[0]))
    matched_idx = jnp.where(any_valid, matched_idx, 0)
    return matched_idx, match_labels
