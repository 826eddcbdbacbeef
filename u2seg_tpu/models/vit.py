"""ViT detection backbone + SimpleFeaturePyramid (ViTDet).

Counterpart of ``detectron2/modeling/backbone/vit.py`` (ViT :232 with
windowed attention :145, SimpleFeaturePyramid :363). Plain ViT trunk with
most blocks using non-overlapping window attention (static window
partition — XLA-friendly reshapes) and a few global blocks; a simple
pyramid built from the final feature map by strided (de)convolutions.
"""
from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.norms import get_norm


def window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> (B*nw, ws, ws, C) with padding (ref vit.py:145)."""
    b, h, w, c = x.shape
    ph = (ws - h % ws) % ws
    pw = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class ViTAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        qkv = nn.Dense(self.dim * 3, name="qkv")(x.reshape(b, n, c))
        qkv = qkv.reshape(b, n, 3, self.num_heads, c // self.num_heads)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        scale = (c // self.num_heads) ** -0.5
        attn = jax.nn.softmax((q * scale) @ k.transpose(0, 1, 3, 2), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(self.dim, name="proj")(out)
        return out.reshape(b, h, w, c)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0       # 0 = global attention
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            hw = y.shape[1:3]
            y, pad_hw = window_partition(y, self.window_size)
            y = ViTAttention(self.dim, self.num_heads, name="attn")(y)
            y = window_unpartition(y, self.window_size, pad_hw, hw)
        else:
            y = ViTAttention(self.dim, self.num_heads, name="attn")(y)
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class ViT(nn.Module):
    """ViT-B/16 trunk by default; out feature "last_feat" stride 16."""

    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_blocks: Tuple[int, ...] = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=(p, p), name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, gh, gw, self.dim)
        )
        x = x + pos
        for i in range(self.depth):
            ws = 0 if i in self.global_blocks else self.window_size
            x = ViTBlock(
                self.dim, self.num_heads, window_size=ws, name=f"block{i}"
            )(x)
        return {"last_feat": x}


class SimpleFeaturePyramid(nn.Module):
    """Build p2..p6 from the single stride-16 ViT map (ref vit.py:363)."""

    out_channels: int = 256
    norm: str = "LN"
    scale_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False):
        init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        results = {}
        dim = feat.shape[-1]
        names = ["p2", "p3", "p4", "p5"]
        for scale, name in zip(self.scale_factors, names):
            x = feat
            if scale == 4.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     name=f"{name}_up1")(x)
                x = nn.LayerNorm(epsilon=1e-6, name=f"{name}_ln_up")(x)
                x = nn.gelu(x, approximate=False)
                x = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                                     name=f"{name}_up2")(x)
            elif scale == 2.0:
                x = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     name=f"{name}_up1")(x)
            elif scale == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        kernel_init=init, name=f"{name}_lateral")(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"{name}_ln1")(x)
            x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, kernel_init=init,
                        name=f"{name}_output")(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"{name}_ln2")(x)
            results[name] = x
        results["p6"] = nn.max_pool(results["p5"], (1, 1), strides=(2, 2))
        return results


class ViTDet(nn.Module):
    """ViT + SimpleFeaturePyramid backbone producing p2..p6."""

    vit: ViT = None  # type: ignore[assignment]
    out_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        trunk = self.vit if self.vit is not None else ViT()
        feats = trunk(x, train=train)
        return SimpleFeaturePyramid(self.out_channels, name="sfp")(
            feats["last_feat"], train=train
        )
