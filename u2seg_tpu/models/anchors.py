"""Anchor generation.

Counterpart of ``detectron2/modeling/anchor_generator.py:86``
(DefaultAnchorGenerator: generate_cell_anchors :148, _grid_anchors :120).
Pure functions producing static anchor arrays per feature level.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """Zero-centered base anchors, shape (A, 4) XYXY.

    Matches ref generate_cell_anchors (anchor_generator.py:148-184):
    area = size^2; w = sqrt(area / ratio); h = ratio * w.
    """
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ratio in aspect_ratios:
            w = math.sqrt(area / ratio)
            h = ratio * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(
    feat_h: int, feat_w: int, stride: int,
    sizes: Sequence[float], aspect_ratios: Sequence[float],
    offset: float = 0.0,
) -> np.ndarray:
    """All anchors for one feature level, shape (H*W*A, 4).

    Ordering matches the reference (_grid_anchors :120-146 + _create_grid_
    offsets): anchors enumerate rows (y) outer, columns (x) middle, cell
    anchors (A) inner — consistent with reshaping NHWC head outputs
    (H, W, A, ...) to (H*W*A, ...).
    """
    base = cell_anchors(sizes, aspect_ratios)  # (A, 4)
    shifts_x = (np.arange(feat_w, dtype=np.float32) + offset) * stride
    shifts_y = (np.arange(feat_h, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(shifts_x, shifts_y)  # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (H*W,1,4)
    return (shifts + base[None]).reshape(-1, 4).astype(np.float32)


def multilevel_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes_per_level: Sequence[Sequence[float]],
    aspect_ratios: Sequence[float],
    offset: float = 0.0,
) -> List[jnp.ndarray]:
    """Anchors for every FPN level (list of (H_l*W_l*A, 4) arrays)."""
    out = []
    for (h, w), stride, sizes in zip(feat_shapes, strides, sizes_per_level):
        out.append(jnp.asarray(grid_anchors(h, w, stride, sizes, aspect_ratios, offset)))
    return out
