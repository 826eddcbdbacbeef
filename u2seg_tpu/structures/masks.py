"""Mask utilities: host-side polygon rasterization + device-side bitmask ops.

Counterpart of ``detectron2/structures/masks.py`` (BitMasks :88, PolygonMasks
:261, polygons_to_bitmask :22) — but the on-device representation is always a
fixed-size dense bitmask array; polygons only exist transiently on the host
while decoding COCO annotations.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def polygons_to_bitmask(polygons: Sequence[np.ndarray], height: int, width: int) -> np.ndarray:
    """Rasterize COCO polygons ([x0,y0,x1,y1,...] lists) to a bool mask.

    Host-side (numpy + cv2). Matches the reference's use of pycocotools
    ``frPyObjects`` + ``merge`` + ``decode`` (masks.py:22-35) up to rasterizer
    rounding: cv2.fillPoly on half-integer shifted points approximates the RLE
    rasterization closely (we use the same approach for speed; exact-RLE
    rasterization lives in evaluation.rle for eval parity).
    """
    import cv2

    mask = np.zeros((height, width), dtype=np.uint8)
    pts = [np.asarray(p, dtype=np.float64).reshape(-1, 2) for p in polygons if len(p) >= 6]
    if not pts:
        return mask.astype(bool)
    # pycocotools rasterizes with a scanline fill over the polygon; cv2's
    # fillPoly with rounded coords is a close approximation.
    int_pts = [np.round(p - 0.5).astype(np.int32) for p in pts]
    cv2.fillPoly(mask, int_pts, 1)
    return mask.astype(bool)


def bitmask_areas(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> (N,) pixel counts."""
    return jnp.sum(masks.astype(jnp.int32), axis=(-2, -1))


def bitmasks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """Tight XYXY boxes of (N, H, W) bool masks; zeros for empty masks.

    Host-side numpy (used during dataset prep). Matches reference
    ``BitMasks.get_bounding_boxes`` (masks.py:441-460).
    """
    n, h, w = masks.shape
    boxes = np.zeros((n, 4), dtype=np.float32)
    for i in range(n):
        ys, xs = np.nonzero(masks[i])
        if len(xs) == 0:
            continue
        boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes


def crop_and_resize(
    masks: jnp.ndarray, boxes: jnp.ndarray, mask_size: int
) -> jnp.ndarray:
    """Crop each full-image mask by its box and resize to (mask_size,
    mask_size) with bilinear sampling — the mask-head training target op
    (reference ``BitMasks.crop_and_resize`` masks.py:501-528, which uses the
    ROIAlign kernel).

    Args:
      masks: (N, H, W) float or bool full-image bitmasks.
      boxes: (N, 4) XYXY in the same coordinate frame.
    Returns:
      (N, mask_size, mask_size) float32 in [0, 1].
    """
    from u2seg_tpu.ops.roi_align import roi_align

    n = masks.shape[0]
    feats = masks.astype(jnp.float32)[:, None, :, :]  # (N,1,H,W)
    batch_idx = jnp.arange(n, dtype=jnp.int32)
    out = roi_align(
        feats, boxes, batch_idx, output_size=mask_size, spatial_scale=1.0,
        sampling_ratio=0, aligned=True,
    )  # (N,1,S,S)
    return out[:, 0]
