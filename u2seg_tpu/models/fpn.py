"""Feature Pyramid Network (Flax, NHWC).

Counterpart of ``detectron2/modeling/backbone/fpn.py:17`` (forward :126,
LastLevelMaxPool :188, build_resnet_fpn_backbone :225): lateral 1x1 convs,
top-down nearest-2x upsampling, 3x3 output convs, plus p6 via stride-2
max-pool (RCNN variant) or p6/p7 convs (RetinaNet variant).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.config.config import FPNConfig, ResNetConfig
from u2seg_tpu.models.resnet import FEATURE_STRIDES, ResNet
from u2seg_tpu.ops.norms import get_norm

_xavier_init = nn.initializers.glorot_uniform()


def _apply_norm(norm_mod, x, train: bool):
    if norm_mod is None:
        return x
    if isinstance(norm_mod, nn.BatchNorm):
        return norm_mod(x, use_running_average=not train)
    return norm_mod(x)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (ref fpn.py:126 F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """Builds p2..p6 from res2..res5 (strides 4..64)."""

    cfg: FPNConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, bottom_up: Dict[str, jnp.ndarray], train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        in_feats = list(c.in_features)  # fine -> coarse, e.g. res2..res5
        use_bias = c.norm == ""

        # top-down: start from coarsest
        results: List[jnp.ndarray] = []
        prev = None
        for name in reversed(in_feats):
            lateral = nn.Conv(
                c.out_channels, (1, 1), use_bias=use_bias,
                kernel_init=_xavier_init, name=f"lateral_{name}",
                dtype=self.dtype,
            )(bottom_up[name])
            lateral = _apply_norm(
                get_norm(c.norm, c.out_channels, dtype=self.dtype), lateral, train
            )
            if prev is not None:
                lateral = lateral + _upsample2x(prev)
                if c.fuse_type == "avg":
                    lateral = lateral / 2.0
            prev = lateral
            out = nn.Conv(
                c.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=use_bias, kernel_init=_xavier_init,
                name=f"output_{name}", dtype=self.dtype,
            )(lateral)
            out = _apply_norm(get_norm(c.norm, c.out_channels, dtype=self.dtype), out, train)
            results.insert(0, out)

        out_dict = {
            f"p{FEATURE_STRIDES[name].bit_length() - 1}": r
            for name, r in zip(in_feats, results)
        }
        if c.top_block == "maxpool":
            # LastLevelMaxPool (ref fpn.py:188): p6 = maxpool(p5, k=1, s=2)
            p5 = results[-1]
            out_dict["p6"] = nn.max_pool(p5, (1, 1), strides=(2, 2))
        elif c.top_block == "p6p7":
            p5 = results[-1]
            p6 = nn.Conv(
                c.out_channels, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                kernel_init=_xavier_init, name="p6",
            )(p5)
            out_dict["p6"] = p6
            out_dict["p7"] = nn.Conv(
                c.out_channels, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                kernel_init=_xavier_init, name="p7",
            )(nn.relu(p6))
        return out_dict


class ResNetFPN(nn.Module):
    """ResNet bottom-up + FPN (ref build_resnet_fpn_backbone fpn.py:225)."""

    resnet_cfg: ResNetConfig
    fpn_cfg: FPNConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        bottom_up = ResNet(self.resnet_cfg, dtype=self.dtype,
                           name="bottom_up")(x, train=train)
        return FPN(self.fpn_cfg, dtype=self.dtype, name="fpn")(
            bottom_up, train=train)


FPN_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
