"""DeepLabV3 / V3+ semantic segmentation heads.

Counterpart of ``projects/DeepLab`` in the reference (~800 LoC): ASPP-based
heads over a single backbone feature (V3) or with a low-level skip
decoder (V3+), plus the "hard pixel mining" top-k CE loss.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.aspp import ASPP, DepthwiseSeparableConv
from u2seg_tpu.ops.losses import softmax_ce


class DeepLabV3Head(nn.Module):
    """ASPP + predictor over res5 (ref deeplab/semantic_seg.py V3 variant)."""

    num_classes: int
    in_feature: str = "res5"
    aspp_dim: int = 256
    norm: str = "GN"
    common_stride: int = 4

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 targets: Optional[jnp.ndarray] = None, train: bool = False):
        x = features[self.in_feature]
        x = ASPP(self.aspp_dim, norm=self.norm, name="aspp")(x, train=train)
        logits = nn.Conv(self.num_classes, (1, 1), name="predictor")(x)
        # upsample to input resolution for loss/inference
        scale = None
        if targets is not None:
            scale = (targets.shape[1], targets.shape[2])
        if scale is None:
            h, w = logits.shape[1] * 32, logits.shape[2] * 32
        else:
            h, w = scale
        full = jax.image.resize(
            logits, (logits.shape[0], h, w, self.num_classes), "bilinear"
        )
        if train and targets is not None:
            return full, {
                "loss_sem_seg": hard_pixel_mining_loss(full, targets)
            }
        return full, {}


class DeepLabV3PlusHead(nn.Module):
    """ASPP on res5 + low-level skip from res2 with separable decoder convs
    (ref deeplab V3+)."""

    num_classes: int
    low_feature: str = "res2"
    high_feature: str = "res5"
    aspp_dim: int = 256
    low_dim: int = 48
    decoder_dim: int = 256
    norm: str = "GN"

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 targets: Optional[jnp.ndarray] = None, train: bool = False):
        high = ASPP(self.aspp_dim, norm=self.norm, name="aspp")(
            features[self.high_feature], train=train
        )
        low = features[self.low_feature]
        low = nn.Conv(self.low_dim, (1, 1), name="low_proj")(low)
        high_up = jax.image.resize(
            high, (low.shape[0], low.shape[1], low.shape[2], self.aspp_dim),
            "bilinear",
        )
        x = jnp.concatenate([high_up, low], axis=-1)
        x = DepthwiseSeparableConv(self.decoder_dim, norm=self.norm,
                                   name="dec1")(x, train=train)
        x = DepthwiseSeparableConv(self.decoder_dim, norm=self.norm,
                                   name="dec2")(x, train=train)
        logits = nn.Conv(self.num_classes, (1, 1), name="predictor")(x)
        if targets is not None:
            h, w = targets.shape[1], targets.shape[2]
        else:
            h, w = logits.shape[1] * 4, logits.shape[2] * 4
        full = jax.image.resize(
            logits, (logits.shape[0], h, w, self.num_classes), "bilinear"
        )
        if train and targets is not None:
            return full, {
                "loss_sem_seg": hard_pixel_mining_loss(full, targets)
            }
        return full, {}


def hard_pixel_mining_loss(
    logits: jnp.ndarray,      # (B, H, W, C)
    targets: jnp.ndarray,     # (B, H, W) int, 255 ignore
    top_k_percent: float = 0.2,
    ignore_label: int = 255,
) -> jnp.ndarray:
    """DeepLab's top-k CE: average the hardest k% pixel losses
    (ref deeplab/loss.py DeepLabCE)."""
    valid = targets != ignore_label
    per = softmax_ce(logits, jnp.where(valid, targets, 0))
    per = jnp.where(valid, per, 0.0)
    flat = per.reshape(per.shape[0], -1)
    k = max(int(flat.shape[1] * top_k_percent), 1)
    topv, _ = jax.lax.top_k(flat, k)
    return jnp.mean(topv)
