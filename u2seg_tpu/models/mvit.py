"""MViTv2 backbone (multiscale vision transformer with pooling attention).

Counterpart of ``detectron2/modeling/backbone/mvit.py:271``: attention with
strided pooling of Q/K/V (spatial downsampling inside attention), residual
pooling, stage transitions that double channels and halve resolution,
emitting a 4-scale pyramid compatible with FPN-style heads.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pool_hw(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(B, H, W, C) spatial avg-pool by stride (1 = identity)."""
    if stride == 1:
        return x
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class PoolingAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int = 1
    kv_stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hd = self.num_heads
        q = nn.Dense(self.dim_out, name="q")(x)
        k = nn.Dense(self.dim_out, name="k")(x)
        v = nn.Dense(self.dim_out, name="v")(x)
        q = _pool_hw(q, self.q_stride)
        k = _pool_hw(k, self.kv_stride)
        v = _pool_hw(v, self.kv_stride)
        qh, qw = q.shape[1], q.shape[2]
        dh = self.dim_out // hd

        def heads(t):
            bb, th, tw, _ = t.shape
            return t.reshape(bb, th * tw, hd, dh).transpose(0, 2, 1, 3)

        qh_, kh_, vh_ = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            (qh_ * dh ** -0.5) @ kh_.transpose(0, 1, 3, 2), axis=-1
        )
        out = (attn @ vh_).transpose(0, 2, 1, 3).reshape(b, qh, qw, self.dim_out)
        # residual pooling (MViTv2): add pooled q
        out = out + q
        return nn.Dense(self.dim_out, name="proj")(out)


class MViTBlock(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int = 1
    kv_stride: int = 1
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        attn = PoolingAttention(
            self.dim_out, self.num_heads, self.q_stride, self.kv_stride,
            name="attn",
        )(y)
        shortcut = x
        if self.q_stride > 1 or x.shape[-1] != self.dim_out:
            shortcut = _pool_hw(x, self.q_stride)
            if shortcut.shape[-1] != self.dim_out:
                shortcut = nn.Dense(self.dim_out, name="shortcut_proj")(shortcut)
        x = shortcut + attn
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, name="mlp_fc2")(y)
        return x + y


class MViT(nn.Module):
    """MViTv2-T-ish by default: stages of depth (1, 2, 5, 2)."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (1, 2, 5, 2)
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    patch_size: int = 4
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (7, 7), strides=(p, p),
                    padding=[(3, 3), (3, 3)], name="patch_embed")(x)
        dim = self.embed_dim
        out: Dict[str, jnp.ndarray] = {}
        for stage, (d, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(d):
                first = i == 0 and stage > 0
                x = MViTBlock(
                    dim_out=dim, num_heads=heads,
                    q_stride=2 if first else 1,
                    kv_stride=2 if stage < len(self.depths) - 1 else 1,
                    name=f"s{stage}_b{i}",
                )(x)
            name = f"res{stage + 2}"
            if name in self.out_features:
                out[name] = nn.LayerNorm(
                    epsilon=1e-6, name=f"{name}_norm"
                )(x)
            if stage < len(self.depths) - 1:
                dim *= 2
                # channel expansion happens in the first block of next stage
        return out
