"""Keypoints: (N, K, 3) arrays of (x, y, visibility) + heatmap conversion.

Counterpart of ``detectron2/structures/keypoints.py`` (Keypoints :8,
_keypoints_to_heatmap :105, heatmaps_to_keypoints :165) and the keypoint
head's target/decode ops.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def keypoints_to_heatmap(
    keypoints: jnp.ndarray,   # (N, K, 3)
    rois: jnp.ndarray,        # (N, 4) XYXY
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Discretize keypoints into per-ROI heatmap bin indices
    (ref keypoints.py:105-163). Returns (heatmaps (N, K) int32 flat index,
    valid (N, K) bool)."""
    offset_x = rois[:, 0][:, None]
    offset_y = rois[:, 1][:, None]
    scale_x = heatmap_size / jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)[:, None]
    scale_y = heatmap_size / jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)[:, None]

    x = keypoints[..., 0]
    y = keypoints[..., 1]
    x_boundary = jnp.abs(x - (offset_x + (rois[:, 2] - rois[:, 0])[:, None])) < 1e-4
    y_boundary = jnp.abs(y - (offset_y + (rois[:, 3] - rois[:, 1])[:, None])) < 1e-4

    xi = jnp.floor((x - offset_x) * scale_x).astype(jnp.int32)
    yi = jnp.floor((y - offset_y) * scale_y).astype(jnp.int32)
    xi = jnp.where(x_boundary, heatmap_size - 1, xi)
    yi = jnp.where(y_boundary, heatmap_size - 1, yi)

    valid_loc = (xi >= 0) & (yi >= 0) & (xi < heatmap_size) & (yi < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = valid_loc & vis
    lin = jnp.clip(yi, 0, heatmap_size - 1) * heatmap_size + jnp.clip(
        xi, 0, heatmap_size - 1
    )
    return lin, valid


def heatmaps_to_keypoints(
    maps: jnp.ndarray,        # (N, H, H, K) logits
    rois: jnp.ndarray,        # (N, 4)
) -> jnp.ndarray:
    """Decode argmax heatmap locations back to image coords with scores
    (ref keypoints.py:165-235, without the 255-upsample refinement: on TPU
    we decode at heatmap resolution then add the half-bin offset).
    Returns (N, K, 4): x, y, logit, prob."""
    n, hs, _, k = maps.shape
    offset_x = rois[:, 0]
    offset_y = rois[:, 1]
    width_corr = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6) / hs
    height_corr = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6) / hs

    flat = maps.transpose(0, 3, 1, 2).reshape(n, k, hs * hs)
    pos = jnp.argmax(flat, axis=-1)
    logits = jnp.max(flat, axis=-1)
    probs = jnp.max(jax.nn.softmax(flat, axis=-1), axis=-1)
    yi = (pos // hs).astype(jnp.float32)
    xi = (pos % hs).astype(jnp.float32)
    x = (xi + 0.5) * width_corr[:, None] + offset_x[:, None]
    y = (yi + 0.5) * height_corr[:, None] + offset_y[:, None]
    return jnp.stack([x, y, logits, probs], axis=-1)
