"""Keypoint R-CNN head.

Counterpart of ``detectron2/modeling/roi_heads/keypoint_head.py``
(KRCNNConvDeconvUpsampleHead, keypoint_rcnn_loss, keypoint_rcnn_inference):
8 conv layers + deconv + 2x bilinear upsample producing per-keypoint
heatmaps; CE loss over flattened heatmap bins at visible GT keypoints.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.losses import softmax_ce
from u2seg_tpu.structures.keypoints import (
    heatmaps_to_keypoints, keypoints_to_heatmap,
)


class KRCNNConvDeconvUpsampleHead(nn.Module):
    num_keypoints: int = 17
    conv_dims: Tuple[int, ...] = (512,) * 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i, d in enumerate(self.conv_dims):
            x = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=init, dtype=self.dtype,
                        name=f"conv_fcn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2),
            kernel_init=init, dtype=self.dtype, name="score_lowres",
        )(x)
        # interp 2x to final heatmap resolution (ref: interpolate scale 2)
        b, h, w, k = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, k), "bilinear")
        return x.astype(jnp.float32)


def keypoint_rcnn_loss(
    heatmap_logits: jnp.ndarray,   # (N, S, S, K)
    gt_keypoints: jnp.ndarray,     # (N, K, 3)
    rois: jnp.ndarray,             # (N, 4)
    valid_roi: jnp.ndarray,        # (N,)
    normalizer: float | None = None,
) -> jnp.ndarray:
    """CE over S*S bins at visible keypoints (ref keypoint_rcnn_loss)."""
    n, s, _, k = heatmap_logits.shape
    targets, vis = keypoints_to_heatmap(gt_keypoints, rois, s)
    logits = heatmap_logits.transpose(0, 3, 1, 2).reshape(n, k, s * s)
    per = softmax_ce(logits, targets)
    mask = vis & valid_roi[:, None]
    total = jnp.sum(per * mask)
    denom = normalizer if normalizer is not None else jnp.maximum(
        jnp.sum(mask), 1.0
    )
    return total / denom


def keypoint_rcnn_inference(
    heatmap_logits: jnp.ndarray,   # (N, S, S, K)
    rois: jnp.ndarray,             # (N, 4)
) -> jnp.ndarray:
    """(N, K, 4): x, y, logit, prob (ref keypoint_rcnn_inference)."""
    return heatmaps_to_keypoints(heatmap_logits, rois)
