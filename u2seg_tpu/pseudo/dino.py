"""DINO Vision Transformer feature extractor (Flax).

Counterpart of ``u2seg/Instance_Clustering/selective_labeling/dino.py``
(vendored DINO VisionTransformer :162, ViTFeat :277): extracts per-patch
key/query/value facet features from the last attention block of a
DINO-pretrained ViT, used to embed masked instance crops for clustering.

Includes a converter from the official torch DINO checkpoints
(``convert_dino_vit``).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, return_qkv: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, c // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]              # (b, h, n, d)
        scale = (c // h) ** -0.5
        attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * scale, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(self.dim, name="proj")(out)
        if return_qkv:
            return out, (q, k, v)
        return out


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, return_qkv: bool = False):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if return_qkv:
            attn_out, qkv = Attention(self.dim, self.num_heads, name="attn")(
                y, return_qkv=True
            )
        else:
            attn_out = Attention(self.dim, self.num_heads, name="attn")(y)
            qkv = None
        x = x + attn_out
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + MLP(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)
        return (x, qkv) if return_qkv else x


class DinoViT(nn.Module):
    """DINO ViT backbone; __call__ returns (cls_feat, patch_facet_feats)."""

    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    facet: str = "k"          # 'k' | 'q' | 'v' | 'out'

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, H, W, 3) normalized. Returns (B, D) cls features and
        (B, H/p * W/p, D) patch facet features from the last block."""
        b, h, w, _ = images.shape
        p = self.patch_size
        x = nn.Conv(
            self.dim, (p, p), strides=(p, p), name="patch_embed",
        )(images)                                     # (B, h/p, w/p, D)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], 1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, gh * gw + 1, self.dim),
        )
        x = x + pos

        qkv_last = None
        for i in range(self.depth):
            if i == self.depth - 1:
                x, qkv_last = Block(
                    self.dim, self.num_heads, name=f"block{i}"
                )(x, return_qkv=True)
            else:
                x = Block(self.dim, self.num_heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)

        q, k, v = qkv_last
        facet_map = {"q": q, "k": k, "v": v}
        if self.facet == "out":
            patch_feats = x[:, 1:, :]
        else:
            f = facet_map[self.facet]                 # (b, heads, n, d)
            f = f.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
            patch_feats = f[:, 1:, :]
        return x[:, 0, :], patch_feats


def interpolate_pos_embed(pos: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Resize a (1, 1+g0*g0, D) DINO pos embed to a new grid (bicubic-ish
    via jax.image bilinear; matches DINO's interpolate_pos_encoding role)."""
    n = pos.shape[1] - 1
    g0 = int(math.sqrt(n))
    cls_pos, grid = pos[:, :1], pos[:, 1:]
    grid = grid.reshape(1, g0, g0, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bilinear")
    return np.concatenate(
        [np.asarray(cls_pos), np.asarray(grid).reshape(1, gh * gw, -1)], axis=1
    )


def convert_dino_vit(state: Dict[str, np.ndarray], depth: int = 12,
                     grid_hw: Optional[Tuple[int, int]] = None) -> Dict:
    """torch DINO ViT state dict -> Flax params for ``DinoViT``."""
    p: Dict = {}

    def put(path, v):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(v)

    pe = state["patch_embed.proj.weight"]             # (D, 3, p, p)
    put(("patch_embed", "kernel"), np.transpose(pe, (2, 3, 1, 0)))
    put(("patch_embed", "bias"), state["patch_embed.proj.bias"])
    put(("cls_token",), state["cls_token"])
    pos = state["pos_embed"]
    if grid_hw is not None:
        pos = interpolate_pos_embed(pos, *grid_hw)
    put(("pos_embed",), pos)
    for i in range(depth):
        s = f"blocks.{i}."
        d = (f"block{i}",)
        put(d + ("norm1", "scale"), state[s + "norm1.weight"])
        put(d + ("norm1", "bias"), state[s + "norm1.bias"])
        put(d + ("attn", "qkv", "kernel"), state[s + "attn.qkv.weight"].T)
        put(d + ("attn", "qkv", "bias"), state[s + "attn.qkv.bias"])
        put(d + ("attn", "proj", "kernel"), state[s + "attn.proj.weight"].T)
        put(d + ("attn", "proj", "bias"), state[s + "attn.proj.bias"])
        put(d + ("norm2", "scale"), state[s + "norm2.weight"])
        put(d + ("norm2", "bias"), state[s + "norm2.bias"])
        put(d + ("mlp", "fc1", "kernel"), state[s + "mlp.fc1.weight"].T)
        put(d + ("mlp", "fc1", "bias"), state[s + "mlp.fc1.bias"])
        put(d + ("mlp", "fc2", "kernel"), state[s + "mlp.fc2.weight"].T)
        put(d + ("mlp", "fc2", "bias"), state[s + "mlp.fc2.bias"])
    put(("norm", "scale"), state["norm.weight"])
    put(("norm", "bias"), state["norm.bias"])
    return p


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def masked_crop_features(
    model: DinoViT, params: Dict, crops: jnp.ndarray,
) -> jnp.ndarray:
    """Embed masked-instance crops: mean of patch facet features per crop
    (ViTFeat usage in usl-imagenet.py:43-110). crops: (B, H, W, 3) in [0,1]
    already masked+normalized."""
    _, patch = model.apply({"params": params}, crops)
    return jnp.mean(patch, axis=1)
