"""RegNet backbone (AnyNet with quantized linear width schedule).

Counterpart of ``detectron2/modeling/backbone/regnet.py`` (RegNet/AnyNet
from "Designing Network Design Spaces"): stem + 4 stages of residual
bottleneck blocks with group convs; widths/depths generated from
(w_a, w_0, w_m, depth) and quantized to multiples of 8.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from u2seg_tpu.ops.norms import get_norm

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def generate_regnet_params(w_a: float, w_0: int, w_m: float, depth: int,
                           q: int = 8, group_width: int = 1,
                           bottleneck_ratio: float = 1.0):
    """Per-stage (widths, depths, group_widths) from the RegNet generator.

    Follows pycls ``generate_regnet`` + ``adjust_block_compatibility``: the
    quantized widths are rounded so each stage's bottleneck width is a
    multiple of its (possibly shrunk) group width — grouped convs always
    divide evenly for any (depth, group_width) combination.
    """
    ws_cont = w_0 + w_a * np.arange(depth)
    ks = np.round(np.log(ws_cont / w_0) / np.log(w_m))
    ws_all = w_0 * np.power(w_m, ks)
    ws_all = np.round(ws_all / q) * q
    widths, depths = np.unique(ws_all.astype(int), return_counts=True)
    order = np.argsort(widths)
    widths, depths = widths[order].tolist(), depths[order].tolist()
    # adjust_block_compatibility (pycls/models/anynet.py): per-stage
    # v = w * b, g = min(g, v), v rounded to a multiple of g, w = v / b.
    adj_ws, gws = [], []
    for w in widths:
        v = max(1, int(round(w * bottleneck_ratio)))
        g = min(group_width, v)
        v = max(g, int(round(v / g)) * g)
        adj_ws.append(int(round(v / bottleneck_ratio)))
        gws.append(g)
    return adj_ws, depths, gws


class _Block(nn.Module):
    width: int
    stride: int
    group_width: int
    norm: str
    bottleneck_ratio: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from u2seg_tpu.models.resnet import _apply_norm

        w_b = int(round(self.width * self.bottleneck_ratio))
        groups = max(w_b // self.group_width, 1)
        out = nn.Conv(w_b, (1, 1), use_bias=False, kernel_init=_conv_init,
                      dtype=self.dtype, name="a")(x)
        out = _apply_norm(get_norm(self.norm, w_b, dtype=self.dtype), out, train)
        out = nn.relu(out)
        out = nn.Conv(w_b, (3, 3), strides=self.stride,
                      padding=[(1, 1), (1, 1)], feature_group_count=groups,
                      use_bias=False, kernel_init=_conv_init,
                      dtype=self.dtype, name="b")(out)
        out = _apply_norm(get_norm(self.norm, w_b, dtype=self.dtype), out, train)
        out = nn.relu(out)
        out = nn.Conv(self.width, (1, 1), use_bias=False,
                      kernel_init=_conv_init, dtype=self.dtype, name="c")(out)
        out = _apply_norm(get_norm(self.norm, self.width, dtype=self.dtype), out, train)
        if x.shape[-1] != self.width or self.stride != 1:
            sc = nn.Conv(self.width, (1, 1), strides=self.stride,
                         use_bias=False, kernel_init=_conv_init,
                         dtype=self.dtype, name="proj")(x)
            sc = _apply_norm(get_norm(self.norm, self.width, dtype=self.dtype), sc, train)
        else:
            sc = x
        return nn.relu(out + sc)


class RegNet(nn.Module):
    """RegNetX by default (RegNetY would add SE blocks).

    Defaults are RegNetX-4.0GF-ish: w_a=38.65, w_0=96, w_m=2.43, depth=23.
    """

    w_a: float = 38.65
    w_0: int = 96
    w_m: float = 2.43
    depth: int = 23
    group_width: int = 40
    stem_width: int = 32
    norm: str = "SyncBN"
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        from u2seg_tpu.models.resnet import _apply_norm

        widths, depths, gws = generate_regnet_params(
            self.w_a, self.w_0, self.w_m, self.depth,
            group_width=self.group_width,
        )
        x = nn.Conv(self.stem_width, (3, 3), strides=2,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="stem")(x)
        x = _apply_norm(get_norm(self.norm, self.stem_width, dtype=self.dtype), x, train)
        x = nn.relu(x)
        out: Dict[str, jnp.ndarray] = {}
        for stage, (w, d, gw) in enumerate(zip(widths, depths, gws)):
            for i in range(d):
                x = _Block(
                    width=int(w), stride=2 if i == 0 else 1,
                    group_width=int(gw), norm=self.norm,
                    dtype=self.dtype, name=f"s{stage + 1}_b{i}",
                )(x, train=train)
            name = f"res{stage + 2}"
            if name in self.out_features:
                out[name] = x
        return out
