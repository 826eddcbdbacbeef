"""Box utilities as pure functions over jnp arrays.

TPU-first counterpart of the reference's ``detectron2/structures/boxes.py``
(Boxes class :130, pairwise_iou :336, BoxMode :13) and
``detectron2/modeling/box_regression.py`` (Box2BoxTransform :21).

Design: no wrapper class — boxes are plain ``(..., 4)`` float arrays in XYXY
absolute coordinates unless stated otherwise. Everything is vmap/jit friendly
with static shapes; invalid rows are tolerated (zero-area boxes) and should be
masked by callers using validity masks.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Box modes (reference: structures/boxes.py:13 BoxMode)
# ---------------------------------------------------------------------------

XYXY_ABS = 0
XYWH_ABS = 1


def convert_mode(boxes: jnp.ndarray, from_mode: int, to_mode: int) -> jnp.ndarray:
    """Convert between XYXY_ABS and XYWH_ABS box encodings."""
    if from_mode == to_mode:
        return boxes
    x0, y0, a, b = jnp.split(boxes, 4, axis=-1)
    if from_mode == XYWH_ABS and to_mode == XYXY_ABS:
        return jnp.concatenate([x0, y0, x0 + a, y0 + b], axis=-1)
    if from_mode == XYXY_ABS and to_mode == XYWH_ABS:
        return jnp.concatenate([x0, y0, a - x0, b - y0], axis=-1)
    raise ValueError(f"Unsupported conversion {from_mode} -> {to_mode}")


# ---------------------------------------------------------------------------
# Basic geometry
# ---------------------------------------------------------------------------

def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of XYXY boxes; negative extents clamp to 0. Shape (...,)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def clip(boxes: jnp.ndarray, image_hw: Tuple[int, int] | jnp.ndarray) -> jnp.ndarray:
    """Clip XYXY boxes to [0, W] x [0, H]. ``image_hw`` is (H, W)."""
    h, w = image_hw[0], image_hw[1]
    x0 = jnp.clip(boxes[..., 0], 0, w)
    y0 = jnp.clip(boxes[..., 1], 0, h)
    x1 = jnp.clip(boxes[..., 2], 0, w)
    y1 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Bool mask of boxes with both sides > threshold (ref boxes.py:186)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def centers(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., :2] + boxes[..., 2:]) * 0.5


def scale(boxes: jnp.ndarray, scale_x: float, scale_y: float) -> jnp.ndarray:
    sx = jnp.asarray(scale_x, boxes.dtype)
    sy = jnp.asarray(scale_y, boxes.dtype)
    return boxes * jnp.stack([sx, sy, sx, sy])


# ---------------------------------------------------------------------------
# Pairwise IoU family (reference: structures/boxes.py:306-425)
# ---------------------------------------------------------------------------

def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas, shape (N, M)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # (N,M,2)
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix, shape (N, M). Zero where union is empty."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection over area of boxes2, shape (N, M) (ref boxes.py:377)."""
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = area(boxes2)[None, :]
    return jnp.where(a2 > 0, inter / jnp.maximum(a2, 1e-12), 0.0)


def matched_pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Element-wise IoU of aligned box lists, shape (N,) (ref boxes.py:405)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_point_box_distance(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Distances from each point to each box's 4 sides, (P, M, 4) (ref boxes.py:389)."""
    x, y = points[:, None, 0], points[:, None, 1]
    x0, y0, x1, y1 = (boxes[None, :, i] for i in range(4))
    return jnp.stack([x - x0, y - y0, x1 - x, y1 - y], axis=-1)


# ---------------------------------------------------------------------------
# Box2BoxTransform (reference: modeling/box_regression.py:21-130)
# ---------------------------------------------------------------------------

#: clamp on dw/dh — log(max box scale change), ref box_regression.py:14
SCALE_CLAMP = math.log(1000.0 / 16)


def get_deltas(
    src_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode target boxes relative to source boxes as (dx, dy, dw, dh).

    Matches reference ``Box2BoxTransform.get_deltas`` (box_regression.py:62).
    Degenerate sources are guarded with a small epsilon so jit never sees NaN;
    callers mask invalid rows.
    """
    src_w = jnp.maximum(src_boxes[..., 2] - src_boxes[..., 0], 1e-6)
    src_h = jnp.maximum(src_boxes[..., 3] - src_boxes[..., 1], 1e-6)
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = jnp.maximum(target_boxes[..., 2] - target_boxes[..., 0], 1e-6)
    tgt_h = jnp.maximum(target_boxes[..., 3] - target_boxes[..., 1], 1e-6)
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    dx = wx * (tgt_cx - src_cx) / src_w
    dy = wy * (tgt_cy - src_cy) / src_h
    dw = ww * jnp.log(tgt_w / src_w)
    dh = wh * jnp.log(tgt_h / src_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    scale_clamp: float = SCALE_CLAMP,
) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas on boxes -> XYXY boxes.

    Matches reference ``Box2BoxTransform.apply_deltas`` (box_regression.py:95).
    ``deltas`` may have shape (..., K*4) applied to boxes (..., 4): each group
    of 4 is decoded against the same box (per-class regression).
    """
    orig_shape = deltas.shape
    k4 = orig_shape[-1]
    assert k4 % 4 == 0, "last dim of deltas must be a multiple of 4"
    d = deltas.reshape(orig_shape[:-1] + (k4 // 4, 4))

    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    wx, wy, ww, wh = weights
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(d[..., 3] / wh, scale_clamp)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(orig_shape)
