"""DensePose (chart-based): dense human surface-coordinate estimation.

Counterpart of the chart pipeline of ``projects/DensePose`` in the
reference — the v1-convX ROI head (modeling/roi_heads/v1convx.py), the
chart predictor (modeling/predictors/chart.py: coarse segmentation K=2/15,
fine segmentation 24+1 patches, per-patch U/V regressions, each deconv-
upsampled 2x then bilinearly scaled 2x), the chart losses
(modeling/losses/chart.py: point-sampled cross-entropy on the fine patch
index, point-sampled smooth-L1 on U/V, mask cross-entropy on the coarse
segmentation), and IUV inference (converters/chart_output_*).

TPU formulation: every instance carries a FIXED number of annotated points
(coords in box-normalized [0,1]^2, patch index, u, v, validity) — the
reference's ragged per-image point lists become masked fixed-capacity
arrays; point sampling is the same bilinear ``point_sample`` the PointRend/
PointSup ports use, so the whole loss is a handful of gathers + reductions
inside the compiled step.

The reference's GPS/GPSm evaluator depends on external SMPL geodesic-
distance data files (densepose/evaluation/densepose_coco_evaluation.py
loads SMPL_subdiv.mat); those cannot be bundled, so quantitative GPS
evaluation is out of scope here — ``point_iuv_errors`` provides the
point-level I-accuracy / U/V-error diagnostics used for validation.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.projects.pointrend import point_sample


@dataclasses.dataclass
class DensePoseConfig:
    """ROI_DENSEPOSE_HEAD defaults (ref densepose/config.py)."""

    num_stacked_convs: int = 8
    conv_head_dim: int = 512
    conv_head_kernel: int = 3
    deconv_kernel: int = 4
    num_coarse_segm_channels: int = 2     # fg/bg (or 15 body parts)
    num_patches: int = 24                 # fine charts (+1 background)
    up_scale: int = 2                     # extra bilinear upscale
    # loss weights (ref config.py: POINT_REGRESSION_WEIGHTS etc.)
    w_points: float = 0.1
    w_part: float = 1.0
    w_segm: float = 2.0


class DensePoseV1ConvXHead(nn.Module):
    """Fully convolutional DensePose head: N stacked 3x3 convs
    (ref v1convx.py:15-64)."""

    cfg: DensePoseConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        for i in range(c.num_stacked_convs):
            x = nn.Conv(
                c.conv_head_dim, (c.conv_head_kernel, c.conv_head_kernel),
                padding="SAME", dtype=self.dtype,
                name=f"body_conv_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class DensePoseChartPredictor(nn.Module):
    """Last layers: 4 deconvs (coarse segm / fine segm / U / V), each
    stride-2 upsampled then bilinearly scaled by ``up_scale``
    (ref predictors/chart.py:15-98)."""

    cfg: DensePoseConfig
    dtype: jnp.dtype = jnp.float32

    def _deconv(self, x, out_ch, name):
        k = self.cfg.deconv_kernel
        y = nn.ConvTranspose(
            out_ch, (k, k), strides=(2, 2), padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype, name=name,
        )(x)
        s = self.cfg.up_scale
        if s > 1:
            b, h, w, c = y.shape
            y = jax.image.resize(y, (b, h * s, w * s, c), "bilinear")
        return y.astype(jnp.float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        return {
            "coarse_segm": self._deconv(x, c.num_coarse_segm_channels,
                                        "ann_index_lowres"),
            "fine_segm": self._deconv(x, c.num_patches + 1,
                                      "index_uv_lowres"),
            "u": self._deconv(x, c.num_patches + 1, "u_lowres"),
            "v": self._deconv(x, c.num_patches + 1, "v_lowres"),
        }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensePosePoints:
    """Fixed-capacity point annotations per ROI (box-normalized coords)."""

    coords: jnp.ndarray     # (R, P, 2) (x, y) in [0,1]^2 wrt the box
    fine_labels: jnp.ndarray  # (R, P) int32 patch index 1..24 (0 = bg)
    u: jnp.ndarray          # (R, P) f32
    v: jnp.ndarray          # (R, P) f32
    valid: jnp.ndarray      # (R, P) bool


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    a = jnp.abs(x)
    return jnp.where(a < 1.0, 0.5 * x * x, a - 0.5)


def densepose_chart_losses(
    outputs: Dict[str, jnp.ndarray],   # predictor outputs, (R, S, S, C)
    points: DensePosePoints,
    coarse_gt: jnp.ndarray,            # (R, S, S) int32 coarse segm labels
    roi_valid: jnp.ndarray,            # (R,) instance validity
    cfg: DensePoseConfig,
) -> Dict[str, jnp.ndarray]:
    """Chart losses (ref losses/chart.py:211-292):
      loss_densepose_U/V: smooth-L1(sum) at annotated points of the GT
        patch's channel, weighted w_points;
      loss_densepose_I:   CE over fine patches at annotated points, w_part;
      loss_densepose_S:   CE of the coarse segmentation vs GT, w_segm.
    """
    live = points.valid & roi_valid[:, None]
    n_pts = jnp.maximum(jnp.sum(live), 1.0)

    sample = jax.vmap(point_sample)            # (R,S,S,C),(R,P,2)->(R,P,C)
    fine_at = sample(outputs["fine_segm"], points.coords)
    u_at = sample(outputs["u"], points.coords)
    v_at = sample(outputs["v"], points.coords)

    # U/V: only points with a foreground fine label regress (ref chart.py:115)
    reg_live = live & (points.fine_labels > 0)
    ch = jnp.clip(points.fine_labels, 0, cfg.num_patches)
    u_est = jnp.take_along_axis(u_at, ch[..., None], axis=-1)[..., 0]
    v_est = jnp.take_along_axis(v_at, ch[..., None], axis=-1)[..., 0]
    loss_u = jnp.sum(_smooth_l1(u_est - points.u) * reg_live) * cfg.w_points
    loss_v = jnp.sum(_smooth_l1(v_est - points.v) * reg_live) * cfg.w_points

    # fine patch index: mean CE over annotated points
    logp = jax.nn.log_softmax(fine_at, axis=-1)
    ce = -jnp.take_along_axis(logp, ch[..., None], axis=-1)[..., 0]
    loss_i = jnp.sum(ce * live) / n_pts * cfg.w_part

    # coarse segmentation: mean CE over all ROI pixels of valid instances
    logp_s = jax.nn.log_softmax(outputs["coarse_segm"], axis=-1)
    k = outputs["coarse_segm"].shape[-1]
    gt = jnp.clip(coarse_gt, 0, k - 1)
    ce_s = -jnp.take_along_axis(logp_s, gt[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(roi_valid) * ce_s.shape[1] * ce_s.shape[2], 1.0)
    loss_s = jnp.sum(ce_s * roi_valid[:, None, None]) / denom * cfg.w_segm

    return {
        "loss_densepose_U": loss_u,
        "loss_densepose_V": loss_v,
        "loss_densepose_I": loss_i,
        "loss_densepose_S": loss_s,
    }


def densepose_chart_inference(
    outputs: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Predictor outputs -> per-pixel (I, U, V) maps
    (ref converters/chart_output_to_chart_result.py): I = argmax fine patch
    gated by the coarse foreground, U/V read from the selected channel."""
    fg = jnp.argmax(outputs["coarse_segm"], axis=-1) > 0      # (R, S, S)
    i_map = jnp.argmax(outputs["fine_segm"], axis=-1)         # (R, S, S)
    i_map = jnp.where(fg, i_map, 0).astype(jnp.int32)
    u = jnp.take_along_axis(outputs["u"], i_map[..., None], axis=-1)[..., 0]
    v = jnp.take_along_axis(outputs["v"], i_map[..., None], axis=-1)[..., 0]
    u = jnp.clip(u, 0.0, 1.0) * (i_map > 0)
    v = jnp.clip(v, 0.0, 1.0) * (i_map > 0)
    return i_map, u, v


class DensePoseROIHead(nn.Module):
    """head + predictor over pooled ROI features (the ROI heads call this
    on 28x28 pooled features; output maps are 28*2*up_scale square)."""

    cfg: DensePoseConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = DensePoseV1ConvXHead(self.cfg, self.dtype, name="head")(pooled)
        return DensePoseChartPredictor(self.cfg, self.dtype,
                                       name="predictor")(x)


def point_iuv_errors(
    outputs: Dict[str, jnp.ndarray], points: DensePosePoints,
) -> Dict[str, jnp.ndarray]:
    """Point-level diagnostics (I-accuracy, mean |dU|, |dV|) — the offline
    GPS metric needs SMPL geodesic tables that cannot be bundled."""
    sample = jax.vmap(point_sample)
    fine_at = sample(outputs["fine_segm"], points.coords)
    i_pred = jnp.argmax(fine_at, axis=-1)
    live = points.valid & (points.fine_labels > 0)
    n = jnp.maximum(jnp.sum(live), 1.0)
    acc = jnp.sum((i_pred == points.fine_labels) * live) / n
    ch = jnp.clip(points.fine_labels, 0, outputs["u"].shape[-1] - 1)
    u_at = jnp.take_along_axis(sample(outputs["u"], points.coords),
                               ch[..., None], -1)[..., 0]
    v_at = jnp.take_along_axis(sample(outputs["v"], points.coords),
                               ch[..., None], -1)[..., 0]
    return {
        "i_accuracy": acc,
        "u_mae": jnp.sum(jnp.abs(u_at - points.u) * live) / n,
        "v_mae": jnp.sum(jnp.abs(v_at - points.v) * live) / n,
    }
