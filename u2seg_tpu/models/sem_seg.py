"""Semantic segmentation FPN head.

Counterpart of ``detectron2/modeling/meta_arch/semantic_seg.py``
(SemSegFPNHead :143, layers :246, losses :255): per-level scale heads
(3x3 conv + GN + relu, 2x bilinear upsamples down to the common stride),
summed, 1x1 predictor, 4x upsample to input resolution, pixel CE with
ignore label 255 and loss weight 0.5.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.config.config import SemSegHeadConfig
from u2seg_tpu.models.fpn import FPN_STRIDES
from u2seg_tpu.ops import losses as L


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


def _upnx_axis(x: jnp.ndarray, axis: int, s: int) -> jnp.ndarray:
    """Exact integer-scale half-pixel bilinear upsample along one axis.

    jax.image.resize("bilinear") at integer scale s samples output center i
    at input coord (i + 0.5)/s - 0.5 (edge-clamped): each of the s phases is
    a fixed two-tap stencil. resize lowers to DENSE (out, in) matmuls that
    dominate the sem-seg head on TPU; the phase-tap interleave is the same
    arithmetic as a few VPU passes.
    """
    lo = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis=axis,
    )
    phases = []
    for p in range(s):
        o = (p + 0.5) / s - 0.5
        if o < 0:
            phases.append((-o) * lo + (1.0 + o) * x)
        else:
            phases.append((1.0 - o) * x + o * hi)
    stacked = jnp.stack(phases, axis=axis + 1)        # (..., n, s, ...)
    new_shape = x.shape[:axis] + (s * x.shape[axis],) + x.shape[axis + 1:]
    return stacked.reshape(new_shape)


def _upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), identical to jax.image.resize
    bilinear (separable half-pixel taps, edge-clamped)."""
    return _upnx_axis(_upnx_axis(x, 1, 2), 2, 2)


def upsample_bilinear(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, sH, sW, C) exact bilinear integer upsample."""
    return _upnx_axis(_upnx_axis(x, 1, s), 2, s)


class SemSegFPNHead(nn.Module):
    cfg: SemSegHeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        targets: Optional[jnp.ndarray] = None,   # (B, H, W) int, 255=ignore
        train: bool = False,
    ):
        c = self.cfg
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        summed = None
        for name in c.in_features:
            stride = FPN_STRIDES[name]
            head_length = max(1, int(math.log2(stride) - math.log2(c.common_stride)))
            x = features[name]
            for k in range(head_length):
                x = nn.Conv(
                    c.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=c.norm == "", kernel_init=init,
                    dtype=self.dtype, name=f"{name}_conv{k}",
                )(x)
                if c.norm == "GN":
                    x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                     name=f"{name}_gn{k}")(x)
                x = nn.relu(x)
                if stride != c.common_stride:
                    x = _upsample2x_bilinear(x)
                    stride //= 2
            summed = x if summed is None else summed + x
        logits = nn.Conv(
            c.num_classes, (1, 1), kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="predictor",
        )(summed).astype(jnp.float32)  # (B, H/4, W/4, C)

        if train and targets is not None:
            # loss at full input resolution (4x bilinear + CE, ref :255-266)
            full = upsample_bilinear(logits, c.common_stride)
            loss = L.softmax_ce_ignore(full, targets, c.ignore_value)
            return logits, {"loss_sem_seg": loss * c.loss_weight}
        # inference: stay at the common stride — panoptic fusion runs at
        # stride 4 anyway and the predictor upsamples only the final labels,
        # saving the 100MB+ full-resolution logit round-trip per batch
        return logits, {}
