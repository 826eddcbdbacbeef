"""Mask pasting (the inverse of ROIAlign) as separable matmuls.

Counterpart of ``detectron2/layers/mask_ops.py`` (``paste_masks_in_image:74``,
``_do_paste_mask:17-74`` which uses ``grid_sample`` with zero padding,
align_corners=False). On TPU the bilinear resample of an axis-aligned box is
separable, so pasting one M x M mask into an H x W canvas is two small
matmuls: ``W_y (H,M) @ mask (M,M) @ W_x^T (M,W)`` — pure MXU work, no gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(lo: jnp.ndarray, hi: jnp.ndarray, out_size: int, m: int) -> jnp.ndarray:
    """Bilinear resample weights along one axis with zero padding.

    For output pixel center p + 0.5, the source coordinate inside the box
    [lo, hi) is ``(p + 0.5 - lo) / (hi - lo) * m - 0.5`` (grid_sample
    align_corners=False convention). Weight of source cell j is
    ``relu(1 - |coord - j|)``, which reproduces zero-padded bilinear.

    Args:
      lo, hi: (K,) box extents along this axis.
      out_size: canvas size along this axis.
      m: mask resolution.
    Returns: (K, out_size, m) float32.
    """
    p = jnp.arange(out_size, dtype=jnp.float32) + 0.5  # (P,)
    size = jnp.maximum(hi - lo, 1e-4)
    coord = (p[None, :] - lo[:, None]) / size[:, None] * m - 0.5  # (K, P)
    j = jnp.arange(m, dtype=jnp.float32)  # (M,)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coord[:, :, None] - j[None, None, :]))
    return w


def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Paste per-ROI masks into full canvases.

    Args:
      masks: (K, M, M) mask probabilities (or logits — linear op).
      boxes: (K, 4) XYXY in canvas coordinates.
      precision: matmul precision. HIGHEST (exact f32) by default; the
        stride-4 panoptic fusion path passes DEFAULT — its output is only
        thresholded at 0.5 and the eval path re-renders exactly at full
        resolution, so bf16 passes are ~6x cheaper for the same segments.
    Returns:
      (K, out_h, out_w) float32; zero outside each box.
    """
    k, m, _ = masks.shape
    wy = _axis_weights(boxes[:, 1], boxes[:, 3], out_h, m)  # (K, H, M)
    wx = _axis_weights(boxes[:, 0], boxes[:, 2], out_w, m)  # (K, W, M)
    return jnp.einsum(
        "khm,kmn,kwn->khw", wy, masks.astype(jnp.float32), wx,
        optimize=True, precision=precision,
    )


def paste_masks_scaled(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
    stride: int,
) -> jnp.ndarray:
    """Paste at a coarser canvas (e.g. stride 4 for panoptic fusion):
    boxes are given in input-image coords, canvas is (out_h, out_w) at
    ``stride`` pixels per cell."""
    return paste_masks(masks, boxes / float(stride), out_h, out_w)
