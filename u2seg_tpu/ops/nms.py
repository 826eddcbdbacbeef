"""Greedy NMS as a static-shape, TPU-friendly blocked algorithm.

Counterpart of the reference's torchvision CUDA ``nms`` / ``batched_nms``
(``detectron2/layers/nms.py:5,20``). Exact greedy semantics (same outputs as
the sequential algorithm on ties broken by score order) but computed in
TILE-sized blocks: cross-tile suppression is dense IoU math, in-tile
suppression uses the iterative "suppression propagation" fixpoint, so the
serial depth is O(num_tiles^2 + num_tiles * chain_depth) rather than O(N).

All functions return fixed-size index buffers + validity masks.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from u2seg_tpu.structures import boxes as box_ops

NMS_TILE = 256  # 2048-candidate sweep on v5e: 256 is ~1.8x faster than 128


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value):
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad, constant_values=value)


def _self_suppression_tile(iou: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Greedy suppression within one tile.

    iou: (T, T) IoU with strictly-upper-triangular structure enforced by the
    caller (iou[k, j] nonzero only for k < j). Returns bool (T,) suppressed.

    Fixpoint: repeatedly remove the suppression power of boxes that are
    themselves suppressed; converges to the greedy result (chain depth
    iterations, bounded by while_loop).
    """

    def cond(state):
        iou_cur, iou_sum, changed = state
        return changed

    def body(state):
        iou_cur, iou_sum, _ = state
        # a box is (currently) suppressed if any remaining earlier box beats it
        suppressed = jnp.max(iou_cur, axis=0) > threshold  # (T,)
        # suppressed boxes cannot suppress others
        iou_next = iou_cur * (~suppressed)[:, None]
        new_sum = jnp.sum(iou_next)
        return iou_next, new_sum, new_sum != iou_sum

    iou0 = iou
    state = (iou0, jnp.sum(iou0), jnp.asarray(True))
    iou_final, _, _ = jax.lax.while_loop(cond, body, state)
    return jnp.max(iou_final, axis=0) > threshold


@partial(jax.jit, static_argnames=("iou_threshold", "max_output", "tile"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    tile: int = NMS_TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS.

    Args:
      boxes: (N, 4) XYXY. Invalid entries should carry score -inf.
      scores: (N,). Use -inf (or very negative) for padding rows.
      iou_threshold: overlap above which the lower-scored box is removed.
      max_output: number of kept indices to return (static).

    Returns:
      keep_idx: (max_output,) int32 indices into the input, score-descending.
      keep_valid: (max_output,) bool.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    sscores = scores[order]
    valid = sscores > -jnp.inf

    # zero out invalid boxes so they produce IoU 0
    sboxes = jnp.where(valid[:, None], sboxes, 0.0)

    sboxes_p = _pad_to_multiple(sboxes, tile, 0, 0.0)
    np_ = sboxes_p.shape[0]
    num_tiles = np_ // tile

    def outer(i, all_boxes):
        box_tile = jax.lax.dynamic_slice(all_boxes, (i * tile, 0), (tile, 4))

        def cross(j, bt):
            prev = jax.lax.dynamic_slice(all_boxes, (j * tile, 0), (tile, 4))
            iou = box_ops.pairwise_iou(prev, bt)  # (T, T)
            sup = jnp.any(iou > iou_threshold, axis=0)
            return bt * (~sup)[:, None]

        box_tile = jax.lax.fori_loop(0, i, cross, box_tile)

        iou = box_ops.pairwise_iou(box_tile, box_tile)
        tri = jnp.triu(jnp.ones((tile, tile), bool), k=1)
        iou = jnp.where(tri, iou, 0.0)
        sup_self = _self_suppression_tile(iou, iou_threshold)
        box_tile = box_tile * (~sup_self)[:, None]
        return jax.lax.dynamic_update_slice(all_boxes, box_tile, (i * tile, 0))

    final_boxes = jax.lax.fori_loop(0, num_tiles, outer, sboxes_p)[:n]
    survived = jnp.any(final_boxes != 0.0, axis=1) & valid

    keep_scores = jnp.where(survived, sscores, -jnp.inf)
    top_scores, top_pos = jax.lax.top_k(keep_scores, max_output)
    keep_idx = order[top_pos].astype(jnp.int32)
    keep_valid = top_scores > -jnp.inf
    return keep_idx, keep_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick (ref nms.py:20-66).

    idxs: (N,) int category (or image) id per box; boxes of different ids
    never suppress each other.
    """
    # offset every class into a disjoint coordinate range
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * span
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold, max_output)
