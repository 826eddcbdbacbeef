"""Panoptic-DeepLab: box-free bottom-up panoptic segmentation.

Counterpart of ``projects/Panoptic-DeepLab`` in the reference (~1.3k LoC):
a semantic head plus an instance branch predicting per-pixel center
heatmaps and center offsets; instances are formed by grouping pixels to
their nearest predicted center (post-processing), then fused with the
semantic prediction into a panoptic map.

TPU formulation: center NMS = max-pool equality (static), top-K centers,
pixel-to-center assignment as an argmin over K distances — all static
shapes, one fused program.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.aspp import ASPP, DepthwiseSeparableConv


class PanopticDeepLabHead(nn.Module):
    """Shared decoder with semantic + center/offset branches."""

    num_classes: int
    decoder_dim: int = 256
    head_dim: int = 32
    norm: str = "GN"

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        x = ASPP(self.decoder_dim, norm=self.norm, name="aspp")(
            features["res5"], train=train
        )
        low = nn.Conv(48, (1, 1), name="low_proj")(features["res2"])
        x = jax.image.resize(
            x, (low.shape[0], low.shape[1], low.shape[2], self.decoder_dim),
            "bilinear",
        )
        x = jnp.concatenate([x, low], axis=-1)
        x = DepthwiseSeparableConv(self.decoder_dim, norm=self.norm,
                                   name="dec")(x, train=train)
        sem = nn.Conv(self.num_classes, (1, 1), name="sem_predictor")(x)
        ins = DepthwiseSeparableConv(self.head_dim, norm=self.norm,
                                     name="ins_dec")(x, train=train)
        center = nn.Conv(1, (1, 1), name="center_predictor")(ins)
        offset = nn.Conv(2, (1, 1), name="offset_predictor")(ins)
        return sem, center[..., 0], offset


def group_pixels_to_instances(
    center_heatmap: jnp.ndarray,   # (H, W) sigmoid-space scores
    offsets: jnp.ndarray,          # (H, W, 2) (dy, dx) toward center
    thing_mask: jnp.ndarray,       # (H, W) bool (semantic argmax is a thing)
    max_centers: int = 128,
    center_threshold: float = 0.1,
    nms_kernel: int = 7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Instance id map from centers + offsets (Panoptic-DeepLab grouping).

    Returns (instance_id (H, W) int32 with 0 = no instance,
             center_scores (max_centers,)).
    """
    h, w = center_heatmap.shape
    # keypoint NMS: a pixel is a center iff it equals the local max
    pad = nms_kernel // 2
    pooled = jax.lax.reduce_window(
        center_heatmap, -jnp.inf, jax.lax.max,
        (nms_kernel, nms_kernel), (1, 1),
        [(pad, pad), (pad, pad)],
    )
    is_peak = (center_heatmap >= pooled) & (center_heatmap > center_threshold)
    scores = jnp.where(is_peak, center_heatmap, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(scores, max_centers)
    cy = (top_idx // w).astype(jnp.float32)
    cx = (top_idx % w).astype(jnp.float32)
    valid_center = top_scores > -jnp.inf

    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    py = yy + offsets[..., 0]
    px = xx + offsets[..., 1]
    # distance of each pixel's voted position to each center
    d2 = (
        (py[..., None] - cy[None, None, :]) ** 2
        + (px[..., None] - cx[None, None, :]) ** 2
    )
    d2 = jnp.where(valid_center[None, None, :], d2, jnp.inf)
    assign = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    has_center = jnp.isfinite(jnp.min(d2, axis=-1))
    inst = jnp.where(thing_mask & has_center, assign + 1, 0)
    return inst, top_scores


def panoptic_deeplab_fusion(
    sem_logits: jnp.ndarray,       # (H, W, C)
    instance_ids: jnp.ndarray,     # (H, W) 0 = stuff
    thing_class_mask: jnp.ndarray, # (C,) bool — which classes are things
    label_divisor: int = 1000,
) -> jnp.ndarray:
    """Merge semantic + instance maps: panoptic id = sem * divisor + inst
    (majority-vote semantic label per instance, Panoptic-DeepLab scheme)."""
    sem = jnp.argmax(sem_logits, axis=-1).astype(jnp.int32)
    is_thing_pixel = thing_class_mask[sem]
    # per-instance majority semantic label via one-hot matmuls
    k = int(jnp.max(instance_ids)) if instance_ids.size == 0 else None
    # static version: vote over a fixed instance capacity
    max_inst = 129
    inst_oh = jax.nn.one_hot(instance_ids, max_inst, dtype=jnp.float32)
    sem_oh = jax.nn.one_hot(sem, sem_logits.shape[-1], dtype=jnp.float32)
    votes = jnp.einsum("hwk,hwc->kc", inst_oh, sem_oh)
    inst_label = jnp.argmax(votes, axis=-1).astype(jnp.int32)
    sem_final = jnp.where(
        (instance_ids > 0) & is_thing_pixel, inst_label[instance_ids], sem
    )
    return sem_final * label_divisor + jnp.where(is_thing_pixel, instance_ids, 0)
