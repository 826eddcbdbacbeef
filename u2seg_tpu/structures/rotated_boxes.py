"""Rotated boxes: (cx, cy, w, h, angle_deg) with exact pairwise IoU.

Counterpart of ``detectron2/structures/rotated_boxes.py`` and the native ops
``csrc/box_iou_rotated`` (polygon-clipping IoU) and ``csrc/nms_rotated``.
TPU design: the rotated-rectangle intersection (Sutherland–Hodgman clipping
of one rectangle against the other's 4 half-planes) is expressed with fixed
vertex capacity (4 -> at most 8 vertices) so the whole IoU matrix is one
vectorized jit computation — no host loop, no custom kernel needed.
Angles are degrees CCW, matching the reference convention.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

MAX_VERTS = 16  # 8 suffices for rect-rect clipping; extra slack is harmless


def corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) rotated boxes -> (..., 4, 2) corner points (CCW)."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    t = jnp.deg2rad(a)
    cos, sin = jnp.cos(t), jnp.sin(t)
    # local corners
    lx = jnp.stack([-w, w, w, -w], -1) * 0.5
    ly = jnp.stack([-h, -h, h, h], -1) * 0.5
    # reference convention (csrc/box_iou_rotated/box_iou_rotated_utils.h:59-75
    # get_rotated_vertices): p = center + [[c, s], [-s, c]] @ (lx, ly) —
    # angle CCW in image coords where y grows downward
    px = lx * cos[..., None] + ly * sin[..., None] + cx[..., None]
    py = -lx * sin[..., None] + ly * cos[..., None] + cy[..., None]
    return jnp.stack([px, py], axis=-1)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    return boxes[..., 2] * boxes[..., 3]


def _clip_poly_halfplane(pts, valid, a, b, c):
    """Clip polygon (pts (V,2), valid (V,)) against half-plane
    a*x + b*y + c >= 0. Returns new (pts, valid) with capacity V."""
    v = MAX_VERTS
    # Gather current polygon in order; operate on fixed capacity with count
    count = jnp.sum(valid)

    def signed(p):
        return a * p[..., 0] + b * p[..., 1] + c

    s = signed(pts)
    inside = s >= 0

    # For each edge i -> j=(i+1)%count, emit up to 2 points.
    idx = jnp.arange(v)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    p_i = pts
    p_j = pts[nxt]
    s_i = s
    s_j = s[nxt]
    in_i = inside
    in_j = inside[nxt]
    edge_valid = idx < count

    # intersection point of segment with the line
    t = s_i / jnp.where(jnp.abs(s_i - s_j) > 1e-12, s_i - s_j, 1e-12)
    inter = p_i + (p_j - p_i) * jnp.clip(t, 0.0, 1.0)[..., None]

    # emit slots: slot 2k = p_j if in_j; slot 2k+1 = inter if in_i != in_j
    out_pts = jnp.zeros((2 * v, 2))
    out_val = jnp.zeros((2 * v,), bool)
    out_pts = out_pts.at[0::2].set(inter)
    out_val = out_val.at[0::2].set(edge_valid & (in_i != in_j))
    out_pts = out_pts.at[1::2].set(p_j)
    out_val = out_val.at[1::2].set(edge_valid & in_j)

    # compact: stable sort invalid slots to the end
    order = jnp.argsort(~out_val)
    out_pts = out_pts[order][:v]
    out_val = out_val[order][:v]
    return out_pts, out_val


def _poly_area(pts, valid):
    """Shoelace area of the (ordered) valid prefix."""
    v = MAX_VERTS
    count = jnp.sum(valid)
    idx = jnp.arange(v)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    x, y = pts[..., 0], pts[..., 1]
    contrib = x * y[nxt] - x[nxt] * y
    contrib = jnp.where(idx < count, contrib, 0.0)
    return 0.5 * jnp.abs(jnp.sum(contrib))


def _pair_intersection_area(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two rotated boxes (each (5,))."""
    c1 = corners(box1)          # (4, 2)
    c2 = corners(box2)
    pts = jnp.zeros((MAX_VERTS, 2)).at[:4].set(c1)
    valid = jnp.zeros((MAX_VERTS,), bool).at[:4].set(True)

    # clip poly1 by each edge of box2's rectangle (half-planes facing inward)
    def halfplane(p, q):
        # inward normal for CCW polygon: left of edge p->q ... sign handled
        a = q[1] - p[1]
        b = -(q[0] - p[0])
        c = -(a * p[0] + b * p[1])
        # orient so the rectangle's center is inside
        center = jnp.mean(c2, axis=0)
        s = a * center[0] + b * center[1] + c
        flip = jnp.where(s < 0, -1.0, 1.0)
        return a * flip, b * flip, c * flip

    for k in range(4):
        a, b, c = halfplane(c2[k], c2[(k + 1) % 4])
        pts, valid = _clip_poly_halfplane(pts, valid, a, b, c)
    return _poly_area(pts, valid)


@jax.jit
def pairwise_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) exact rotated IoU (ref csrc/box_iou_rotated)."""
    inter = jax.vmap(
        lambda b1: jax.vmap(lambda b2: _pair_intersection_area(b1, b2))(boxes2)
    )(boxes1)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms_rotated(
    boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
    max_output: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS on rotated boxes (ref csrc/nms_rotated). Same blocked
    algorithm as ops.nms but with the rotated IoU; implemented as a simple
    sequential scan (rotated NMS inputs are small in practice)."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sb = boxes[order]
    ss = scores[order]
    valid = ss > -jnp.inf
    iou = pairwise_iou_rotated(sb, sb)
    tri = jnp.triu(jnp.ones((n, n), bool), k=1)
    iou = jnp.where(tri & valid[None, :] & valid[:, None], iou, 0.0)

    def body(i, suppressed):
        row = iou[i] > iou_threshold
        new_sup = jnp.where(suppressed[i], suppressed, suppressed | row)
        return new_sup

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep_scores = jnp.where(~suppressed & valid, ss, -jnp.inf)
    top_s, top_i = jax.lax.top_k(keep_scores, min(max_output, n))
    return order[top_i].astype(jnp.int32), top_s > -jnp.inf


def clip_rotated(boxes: jnp.ndarray, image_hw, clip_angle_threshold: float = 1.0):
    """Clip near-axis-aligned rotated boxes to the image
    (ref rotated_boxes.py clip: only |angle| <= threshold boxes clipped)."""
    h, w = image_hw[0], image_hw[1]
    cx, cy, bw, bh, a = (boxes[..., i] for i in range(5))
    x0 = jnp.clip(cx - bw / 2, 0, w)
    x1 = jnp.clip(cx + bw / 2, 0, w)
    y0 = jnp.clip(cy - bh / 2, 0, h)
    y1 = jnp.clip(cy + bh / 2, 0, h)
    clipped = jnp.stack(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0, a], axis=-1
    )
    near_axis = jnp.abs(((a + 180) % 360) - 180)[..., None] <= clip_angle_threshold
    return jnp.where(near_axis, clipped, boxes)


# ---------------------------------------------------------------------------
# Box2BoxTransformRotated (ref modeling/box_regression.py:133-230)
# ---------------------------------------------------------------------------

def get_deltas_rotated(src: jnp.ndarray, target: jnp.ndarray,
                       weights=(1.0, 1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """(dx, dy, dw, dh, da) encoding between (cx, cy, w, h, angle) boxes;
    da in [-180, 180) degrees normalized like the reference."""
    wx, wy, ww, wh, wa = weights
    dx = wx * (target[..., 0] - src[..., 0]) / jnp.maximum(src[..., 2], 1e-6)
    dy = wy * (target[..., 1] - src[..., 1]) / jnp.maximum(src[..., 3], 1e-6)
    dw = ww * jnp.log(target[..., 2] / jnp.maximum(src[..., 2], 1e-6))
    dh = wh * jnp.log(target[..., 3] / jnp.maximum(src[..., 3], 1e-6))
    da = target[..., 4] - src[..., 4]
    da = (da + 180.0) % 360.0 - 180.0
    da = wa * da * math.pi / 180.0
    return jnp.stack([dx, dy, dw, dh, da], axis=-1)


def apply_deltas_rotated(deltas: jnp.ndarray, boxes: jnp.ndarray,
                         weights=(1.0, 1.0, 1.0, 1.0, 1.0),
                         scale_clamp: float = math.log(1000.0 / 16)) -> jnp.ndarray:
    wx, wy, ww, wh, wa = weights
    cx = boxes[..., 0] + deltas[..., 0] / wx * boxes[..., 2]
    cy = boxes[..., 1] + deltas[..., 1] / wy * boxes[..., 3]
    w = boxes[..., 2] * jnp.exp(jnp.minimum(deltas[..., 2] / ww, scale_clamp))
    h = boxes[..., 3] * jnp.exp(jnp.minimum(deltas[..., 3] / wh, scale_clamp))
    a = boxes[..., 4] + deltas[..., 4] / wa * 180.0 / math.pi
    a = (a + 180.0) % 360.0 - 180.0
    return jnp.stack([cx, cy, w, h, a], axis=-1)
