"""TridentNet: scale-aware parallel dilated branches.

Counterpart of ``projects/TridentNet`` in the reference (~580 LoC): the
trident block runs the same (weight-shared) 3x3 conv at several dilations,
producing one branch per scale range; at inference the branches' detections
are merged by NMS. Weight sharing is natural in Flax: one param, three
``lax.conv_general_dilated`` calls.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.norms import get_norm


class TridentConv(nn.Module):
    """Weight-shared multi-dilation conv (the trident op)."""

    features: int
    dilations: Tuple[int, ...] = (1, 2, 3)
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, branches: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        """branches: one input per dilation (or a single input broadcast)."""
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, branches[0].shape[-1], self.features),
        )
        outs = []
        for x, d in zip(branches, self.dilations):
            pad = d * (k - 1) // 2
            outs.append(jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                [(pad, pad), (pad, pad)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ))
        return tuple(outs)


class TridentBlock(nn.Module):
    """Bottleneck residual block with a trident 3x3 (weight-shared across
    branches); norms are branch-specific like the reference."""

    out_channels: int
    bottleneck_channels: int
    dilations: Tuple[int, ...] = (1, 2, 3)
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, branches: Sequence[jnp.ndarray], train: bool = False):
        from u2seg_tpu.models.resnet import _apply_norm

        n = len(self.dilations)
        conv1 = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")
        conv3 = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv3")
        mid = [nn.relu(_apply_norm(
            get_norm(self.norm, self.bottleneck_channels, dtype=self.dtype), conv1(b), train
        )) for b in branches]
        mid = TridentConv(
            self.bottleneck_channels, self.dilations, dtype=self.dtype,
            name="trident",
        )(mid)
        outs = []
        for i, (b, m) in enumerate(zip(branches, mid)):
            m = nn.relu(_apply_norm(
                get_norm(self.norm, self.bottleneck_channels, dtype=self.dtype), m, train
            ))
            m = _apply_norm(get_norm(self.norm, self.out_channels, dtype=self.dtype),
                            conv3(m), train)
            if b.shape[-1] != self.out_channels:
                b = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"shortcut{i}")(b)
            outs.append(nn.relu(b + m))
        return tuple(outs)


def make_trident_stage(x: jnp.ndarray, num_blocks: int, out_channels: int,
                       bottleneck_channels: int, module_ctor=TridentBlock,
                       **kwargs):
    """Expand a single feature into trident branches through a stage."""
    branches = (x, x, x)
    for i in range(num_blocks):
        branches = module_ctor(
            out_channels=out_channels,
            bottleneck_channels=bottleneck_channels,
            name=f"trident_block{i}", **kwargs,
        )(branches)
    return branches
