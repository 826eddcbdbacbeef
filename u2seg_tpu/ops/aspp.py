"""ASPP (atrous spatial pyramid pooling) + depthwise-separable conv blocks.

Counterpart of ``detectron2/layers/aspp.py`` (ASPP :19) and ``blocks.py``
(DepthwiseSeparableConv2d :57), used by the DeepLab project heads.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.norms import get_norm


def _apply_norm(norm_mod, x, train):
    if norm_mod is None:
        return x
    if isinstance(norm_mod, nn.BatchNorm):
        return norm_mod(x, use_running_average=not train)
    return norm_mod(x)


class DepthwiseSeparableConv(nn.Module):
    """depthwise 3x3 + pointwise 1x1, each with norm+relu (ref blocks.py:57)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    norm: str = "GN"
    dtype: Any = None  # activation dtype for norms (None = f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        x = nn.Conv(
            cin, (self.kernel_size, self.kernel_size),
            padding=[(self.padding,) * 2] * 2,
            kernel_dilation=self.dilation,
            feature_group_count=cin, use_bias=not self.norm,
            name="depthwise",
        )(x)
        x = _apply_norm(get_norm(self.norm, cin, dtype=self.dtype), x, train)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=not self.norm,
                    name="pointwise")(x)
        x = _apply_norm(get_norm(self.norm, self.features, dtype=self.dtype), x, train)
        return nn.relu(x)


class ASPP(nn.Module):
    """1x1 + three dilated 3x3 branches + image pooling, fused by a 1x1
    projection (ref aspp.py:19; dilations default (6, 12, 18))."""

    features: int
    dilations: Tuple[int, int, int] = (6, 12, 18)
    norm: str = "GN"
    dropout: float = 0.0
    pool_kernel_size: Optional[Tuple[int, int]] = None  # None = global
    dtype: Any = None  # activation dtype for norms (None = f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = []
        b1 = nn.Conv(self.features, (1, 1), use_bias=not self.norm, name="b0")(x)
        b1 = _apply_norm(get_norm(self.norm, self.features, dtype=self.dtype), b1, train)
        branches.append(nn.relu(b1))
        for i, d in enumerate(self.dilations):
            b = nn.Conv(
                self.features, (3, 3), padding=[(d, d), (d, d)],
                kernel_dilation=d, use_bias=not self.norm, name=f"b{i + 1}",
            )(x)
            b = _apply_norm(get_norm(self.norm, self.features, dtype=self.dtype), b, train)
            branches.append(nn.relu(b))
        # image-level pooling branch
        h, w = x.shape[1:3]
        if self.pool_kernel_size is None:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            kh, kw = self.pool_kernel_size
            pooled = nn.avg_pool(x, (kh, kw), strides=(kh, kw))
        pooled = nn.Conv(self.features, (1, 1), name="pool_conv")(pooled)
        pooled = nn.relu(pooled)
        pooled = jax.image.resize(
            pooled, (x.shape[0], h, w, self.features), "bilinear"
        )
        branches.append(pooled)

        out = jnp.concatenate(branches, axis=-1)
        out = nn.Conv(self.features, (1, 1), use_bias=not self.norm,
                      name="project")(out)
        out = _apply_norm(get_norm(self.norm, self.features, dtype=self.dtype), out, train)
        out = nn.relu(out)
        if self.dropout > 0 and train:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out
