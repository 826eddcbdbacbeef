"""ResNet backbone (Flax, NHWC).

Counterpart of ``detectron2/modeling/backbone/resnet.py`` (BasicStem :32,
BottleneckBlock :213, ResNet :362, build_resnet_backbone :614). Returns a
dict of feature maps keyed "res2".."res5" with strides 4/8/16/32.

TPU notes: NHWC layout, bf16-friendly (params stay f32; activations cast by
the caller's policy), ``stride_in_1x1=False`` (torchvision/DINO convention,
u2seg_R50_800.yaml via RESNETS.STRIDE_IN_1X1: False).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.config.config import ResNetConfig
from u2seg_tpu.ops.norms import get_norm

# depth -> blocks per stage (ref resnet.py:614-697)
STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _norm(norm_name: str, features: int, dtype=None):
    return get_norm(norm_name, features, dtype=dtype)


class BasicStem(nn.Module):
    """7x7/2 conv + norm + relu + 3x3/2 maxpool (ref resnet.py:32-97)."""

    out_channels: int = 64
    norm: str = "SyncBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
            use_bias=False, kernel_init=_conv_init, name="conv1",
            dtype=self.dtype,
        )(x)
        x = _apply_norm(_norm(self.norm, self.out_channels, self.dtype), x, train, name_scope=self)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return x


def _apply_norm(norm_mod, x, train: bool, name_scope=None):
    if norm_mod is None:
        return x
    if isinstance(norm_mod, nn.BatchNorm):
        return norm_mod(x, use_running_average=not train)
    return norm_mod(x)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 with residual (ref resnet.py:213-329)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = False
    dilation: int = 1
    norm: str = "SyncBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        out = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=s1, use_bias=False,
            kernel_init=_conv_init, name="conv1", dtype=self.dtype,
        )(x)
        out = _apply_norm(_norm(self.norm, self.bottleneck_channels, self.dtype), out, train)
        out = nn.relu(out)

        pad = self.dilation
        out = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=s3,
            padding=[(pad, pad), (pad, pad)], kernel_dilation=self.dilation,
            use_bias=False, kernel_init=_conv_init, name="conv2",
            dtype=self.dtype,
        )(out)
        out = _apply_norm(_norm(self.norm, self.bottleneck_channels, self.dtype), out, train)
        out = nn.relu(out)

        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=False,
            kernel_init=_conv_init, name="conv3", dtype=self.dtype,
        )(out)
        out = _apply_norm(_norm(self.norm, self.out_channels, self.dtype), out, train)

        if in_channels != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                kernel_init=_conv_init, name="shortcut", dtype=self.dtype,
            )(x)
            shortcut = _apply_norm(_norm(self.norm, self.out_channels, self.dtype), shortcut, train)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class ResNet(nn.Module):
    """Staged ResNet with partial freezing and multi-feature output
    (ref resnet.py:362-612)."""

    cfg: ResNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        blocks_per_stage = STAGE_BLOCKS[c.depth]
        stem = BasicStem(c.stem_out_channels, c.norm, dtype=self.dtype,
                         name="stem")
        x = stem(x, train=train and c.freeze_at < 1)
        if c.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        out: Dict[str, jnp.ndarray] = {}
        out_channels = c.res2_out_channels
        bottleneck_channels = c.num_groups * c.width_per_group
        for stage_idx in range(4):  # res2..res5
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            stage_train = train and c.freeze_at < stage_idx + 2
            for block_idx in range(blocks_per_stage[stage_idx]):
                x = BottleneckBlock(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck_channels,
                    stride=stride if block_idx == 0 else 1,
                    stride_in_1x1=c.stride_in_1x1,
                    norm=c.norm,
                    dtype=self.dtype,
                    name=f"{name}_{block_idx}",
                )(x, train=stage_train)
            if c.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            if name in c.out_features:
                out[name] = x
            out_channels *= 2
            bottleneck_channels *= 2
        return out


FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


def feature_channels(cfg: ResNetConfig) -> Dict[str, int]:
    ch = cfg.res2_out_channels
    return {f"res{i + 2}": ch * (2 ** i) for i in range(4)}
