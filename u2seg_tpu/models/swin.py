"""Swin Transformer backbone.

Counterpart of ``detectron2/modeling/backbone/swin.py:510`` (SwinTransformer
with shifted-window attention :49-78, patch merging, stage outputs at
strides 4/8/16/32 compatible with FPN).

TPU notes: window partition/shift are static reshapes + jnp.roll; the
relative position bias table is gathered once per block (static index).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from u2seg_tpu.models.vit import window_partition, window_unpartition


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)                                     # (2, ws*ws)
    rel = coords[:, :, None] - coords[:, None, :]        # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW, N, C) windows; mask: (num_win, N, N) or None."""
        nw, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(nw, n, 3, h, c // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (c // h) ** -0.5
        attn = (q * scale) @ k.transpose(0, 1, 3, 2)     # (nW, h, N, N)

        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = _relative_position_index(self.window_size)
        bias = bias_table[idx.reshape(-1)].reshape(n, n, h)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            num_win = mask.shape[0]
            attn = attn.reshape(nw // num_win, num_win, h, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(nw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(nw, n, c)
        return nn.Dense(self.dim, name="proj")(out)


def _shift_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (Swin paper)."""
    img_mask = np.zeros((hp, wp))
    cnt = 0
    for hsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hsl, wsl] = cnt
            cnt += 1
    m = img_mask.reshape(hp // ws, ws, wp // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        wins, pad_hw = window_partition(y, self.window_size)
        nw = wins.shape[0]
        wins = wins.reshape(nw, self.window_size ** 2, c)
        mask = None
        if self.shift > 0:
            mask = jnp.asarray(
                _shift_mask(pad_hw[0], pad_hw[1], self.window_size, self.shift)
            )
        wins = WindowAttention(
            self.dim, self.num_heads, self.window_size, name="attn"
        )(wins, mask)
        wins = wins.reshape(nw, self.window_size, self.window_size, c)
        y = window_unpartition(wins, self.window_size, pad_hw, (h, w))
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ph, pw = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2],
        ], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T by default: depths (2,2,6,2), dim 96, heads (3,6,12,24)."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        out: Dict[str, jnp.ndarray] = {}
        dim = self.embed_dim
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for blk in range(depth):
                x = SwinBlock(
                    dim, heads, self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    name=f"stage{stage}_block{blk}",
                )(x)
            name = f"res{stage + 2}"
            if name in self.out_features:
                out[name] = nn.LayerNorm(
                    epsilon=1e-5, name=f"{name}_out_norm"
                )(x)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"merge{stage}")(x)
                dim *= 2
        return out
