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
evaluation is out of scope — densepose_eval.DensePoseCOCOEvaluator
implements the reference's mask-IoU eval mode (DensePoseEvalMode.IOU)
instead, and ``point_iuv_errors`` provides the point-level I-accuracy /
U/V-error diagnostics.

Data flows in fixed-capacity arrays (densepose_data.py): GT points are
GT-box-relative; ``remap_points_to_proposals`` /
``resample_coarse_segm_gt`` re-express them in each matched proposal's
frame with the reference's exact interpolation conventions
(losses/utils.py:16-60 _linear_interpolation_utilities, :195-235
resample_data with align_corners=True).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


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
    # confidence-aware UV regression (ref losses/chart_with_confidences.py,
    # predictors/chart_confidence.py; UV_CONFIDENCE.{ENABLED,TYPE,EPSILON}):
    # "" = plain smooth-L1; "iid_iso" adds a sigma_2 head; "indep_aniso"
    # adds sigma_2 + kappa_u + kappa_v heads
    uv_confidence: str = ""
    uv_confidence_epsilon: float = 0.01


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
        out = {
            "coarse_segm": self._deconv(x, c.num_coarse_segm_channels,
                                        "ann_index_lowres"),
            "fine_segm": self._deconv(x, c.num_patches + 1,
                                      "index_uv_lowres"),
            "u": self._deconv(x, c.num_patches + 1, "u_lowres"),
            "v": self._deconv(x, c.num_patches + 1, "v_lowres"),
        }
        # confidence heads (ref predictors/chart_confidence.py:59-117)
        if c.uv_confidence:
            out["sigma_2"] = self._deconv(
                x, c.num_patches + 1, "sigma_2_lowres")
            if c.uv_confidence == "indep_aniso":
                out["kappa_u"] = self._deconv(
                    x, c.num_patches + 1, "kappa_u_lowres")
                out["kappa_v"] = self._deconv(
                    x, c.num_patches + 1, "kappa_v_lowres")
        return out


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


def chart_point_sample(maps: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with the chart-loss grid convention
    (ref losses/utils.py:16-60): grid index = coord01 * S, lower corner
    floor-clamped to [0, S-1], upper = lower + 1 clamped, fractional
    weight measured after clamping — i.e. index 0 sits at the box's left
    edge, NOT at the first pixel center.

    Args:
      maps: (R, S, S, C); coords01: (R, P, 2) as (x, y) in [0, 1] of the
        proposal box.
    Returns: (R, P, C).
    """
    r, s, _, c = maps.shape

    def one(m, pts):
        def axis_idx(v):
            vg = v * s
            lo = jnp.clip(jnp.floor(vg).astype(jnp.int32), 0, s - 1)
            hi = jnp.minimum(lo + 1, s - 1)
            w = jnp.minimum(hi.astype(vg.dtype), vg) - lo
            return lo, hi, w

        xlo, xhi, xw = axis_idx(pts[:, 0])
        ylo, yhi, yw = axis_idx(pts[:, 1])
        f = m.reshape(s * s, c)
        v00 = f[ylo * s + xlo]
        v01 = f[ylo * s + xhi]
        v10 = f[yhi * s + xlo]
        v11 = f[yhi * s + xhi]
        top = v00 + (v01 - v00) * xw[:, None]
        bot = v10 + (v11 - v10) * xw[:, None]
        return top + (bot - top) * yw[:, None]

    return jax.vmap(one)(maps, coords01)


def remap_points_to_proposals(
    dp_xy: jnp.ndarray,      # (R, P, 2) in [0,1] of the matched GT box
    gt_boxes: jnp.ndarray,   # (R, 4) xyxy matched GT box per proposal
    prop_boxes: jnp.ndarray,  # (R, 4) xyxy proposal box
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GT-box-relative annotated points -> proposal-box-relative [0,1]
    coords + an in-proposal validity mask (ref losses/utils.py:53-56:
    j_valid = (v - v0_dst >= 0) * (v - v0_dst < size_dst))."""
    g0 = gt_boxes[:, None, :2]
    gsz = jnp.maximum(gt_boxes[:, None, 2:] - g0, 1e-6)
    p0 = prop_boxes[:, None, :2]
    psz = jnp.maximum(prop_boxes[:, None, 2:] - p0, 1e-6)
    v = g0 + dp_xy * gsz
    coords01 = (v - p0) / psz
    inside = jnp.all((coords01 >= 0.0) & (coords01 < 1.0), axis=-1)
    return coords01, inside


def resample_coarse_segm_gt(
    dp_segm: jnp.ndarray,     # (R, Sg, Sg) int part labels, GT-box frame
    gt_boxes: jnp.ndarray,    # (R, 4) xyxy
    prop_boxes: jnp.ndarray,  # (R, 4) xyxy
    out_size: int,
    binarize: bool = True,
) -> jnp.ndarray:
    """Nearest-resample the GT part raster into each proposal's SxS grid
    (ref losses/utils.py:195-235 resample_data: output grid at j/S, source
    index xn*(Sg-1) under align_corners=True, zeros padding), optionally
    binarized for the 2-channel coarse head (ref losses/segm.py:66-68)."""
    r, sg, _ = dp_segm.shape
    s = out_size
    grid = jnp.arange(s, dtype=jnp.float32) / s            # j / S
    p0 = prop_boxes[:, :2]
    psz = prop_boxes[:, 2:] - p0
    g0 = gt_boxes[:, :2]
    gsz = jnp.maximum(gt_boxes[:, 2:] - g0, 1e-6)
    # image coords of output grid lines, then normalized into the GT box
    x = (p0[:, :1] + grid[None, :] * psz[:, :1] - g0[:, :1]) / gsz[:, :1]
    y = (p0[:, 1:] + grid[None, :] * psz[:, 1:] - g0[:, 1:]) / gsz[:, 1:]
    xi = jnp.round(x * (sg - 1)).astype(jnp.int32)          # (R, S)
    yi = jnp.round(y * (sg - 1)).astype(jnp.int32)
    x_ok = (xi >= 0) & (xi <= sg - 1)
    y_ok = (yi >= 0) & (yi <= sg - 1)
    xi = jnp.clip(xi, 0, sg - 1)
    yi = jnp.clip(yi, 0, sg - 1)

    def one(seg, yy, xx):
        return seg[yy[:, None], xx[None, :]]

    out = jax.vmap(one)(dp_segm, yi, xi)
    out = jnp.where(y_ok[:, :, None] & x_ok[:, None, :], out, 0)
    if binarize:
        out = (out > 0).astype(jnp.int32)
    return out


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

    fine_at = chart_point_sample(outputs["fine_segm"], points.coords)
    u_at = chart_point_sample(outputs["u"], points.coords)
    v_at = chart_point_sample(outputs["v"], points.coords)

    # U/V: only points with a foreground fine label regress (ref chart.py:115)
    reg_live = live & (points.fine_labels > 0)
    ch = jnp.clip(points.fine_labels, 0, cfg.num_patches)
    u_est = jnp.take_along_axis(u_at, ch[..., None], axis=-1)[..., 0]
    v_est = jnp.take_along_axis(v_at, ch[..., None], axis=-1)[..., 0]
    uv_losses: Dict[str, jnp.ndarray] = {}
    if cfg.uv_confidence:
        # Gaussian NLL UV regression (ref chart_with_confidences.py:118-209;
        # Neverova et al., NeurIPS 2019). sigma^2 = softplus(s) + epsilon.
        s_at = chart_point_sample(outputs["sigma_2"], points.coords)
        s_est = jnp.take_along_axis(s_at, ch[..., None], axis=-1)[..., 0]
        sigma2 = jax.nn.softplus(s_est) + cfg.uv_confidence_epsilon
        du = u_est - points.u
        dv = v_est - points.v
        delta2 = du * du + dv * dv
        log2pi = math.log(2.0 * math.pi)
        if cfg.uv_confidence == "iid_iso":
            nll = 0.5 * (log2pi + 2.0 * jnp.log(sigma2) + delta2 / sigma2)
        elif cfg.uv_confidence == "indep_aniso":
            ku_at = chart_point_sample(outputs["kappa_u"], points.coords)
            kv_at = chart_point_sample(outputs["kappa_v"], points.coords)
            ku = jnp.take_along_axis(ku_at, ch[..., None], axis=-1)[..., 0]
            kv = jnp.take_along_axis(kv_at, ch[..., None], axis=-1)[..., 0]
            r2 = ku * ku + kv * kv
            delta_r = du * ku + dv * kv
            denom2 = sigma2 * (sigma2 + r2)
            nll = 0.5 * (log2pi + jnp.log(denom2) + delta2 / sigma2
                         - (delta_r * delta_r) / denom2)
        else:
            raise ValueError(cfg.uv_confidence)
        uv_losses["loss_densepose_UV"] = (
            jnp.sum(nll * reg_live) * cfg.w_points
        )
    else:
        uv_losses["loss_densepose_U"] = (
            jnp.sum(_smooth_l1(u_est - points.u) * reg_live) * cfg.w_points)
        uv_losses["loss_densepose_V"] = (
            jnp.sum(_smooth_l1(v_est - points.v) * reg_live) * cfg.w_points)

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

    return dict(uv_losses,
                loss_densepose_I=loss_i,
                loss_densepose_S=loss_s)


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


class DensePoseHeads(nn.Module):
    """Pool + head + predictor over FPN features, with train losses and
    inference — the densepose branch of the reference's
    ``DensePoseROIHeads`` (densepose/modeling/roi_heads/roi_head.py:
    _forward_densepose; pooler resolution 28 on p2-p5), composed with any
    of this repo's RCNN-style models.

    Train: pass fg-selected ROI boxes + the matched GT arrays
    (densepose_data.pack_densepose_gt layout, gathered per-ROI by the
    caller or via select_densepose_rois). Inference: pass detection boxes;
    returns the chart outputs for each ROI.
    """

    cfg: DensePoseConfig
    pooler_resolution: int = 28
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    dtype: jnp.dtype = jnp.float32

    def _pool(self, features, boxes):
        from u2seg_tpu.ops.roi_align import multilevel_roi_align

        b, r, _ = boxes.shape
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        feats = [features[f"p{i + 2}"] for i in range(len(self.strides))]
        return multilevel_roi_align(
            feats, boxes.reshape(-1, 4), batch_idx, self.pooler_resolution,
            self.strides,
        )

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],   # FPN maps, NHWC
        boxes: jnp.ndarray,                 # (B, R, 4) xyxy image coords
        train: bool = False,
        gt: Optional[Dict[str, jnp.ndarray]] = None,  # per-ROI GT arrays
        roi_live: Optional[jnp.ndarray] = None,       # (B, R)
    ):
        pooled = self._pool(features, boxes).astype(self.dtype)
        outputs = DensePoseROIHead(self.cfg, self.dtype, name="densepose")(
            pooled)
        if not train:
            b, r, _ = boxes.shape
            return {k: v.reshape(b, r, *v.shape[1:])
                    for k, v in outputs.items()}
        assert gt is not None and roi_live is not None
        flat = lambda x: x.reshape(-1, *x.shape[2:])  # noqa: E731
        return densepose_losses_from_raw(
            outputs, flat(boxes), flat(roi_live), flat(gt["gt_boxes"]),
            flat(gt["dp_xy"]), flat(gt["dp_i"]), flat(gt["dp_u"]),
            flat(gt["dp_v"]), flat(gt["dp_point_valid"]),
            flat(gt["dp_segm"]), self.cfg,
        )


def gather_densepose_gt_for_rois(
    gt: Dict[str, jnp.ndarray],   # packed per-image GT (B, G, ...) arrays
    gt_boxes: jnp.ndarray,        # (B, G, 4) xyxy
    roi_gt_idx: jnp.ndarray,      # (B, R) matched GT slot per selected ROI
) -> Dict[str, jnp.ndarray]:
    """Gather the per-image packed densepose GT into per-ROI arrays."""

    def take(x):
        idx = roi_gt_idx
        for _ in range(x.ndim - 2):
            idx = idx[..., None]
        return jnp.take_along_axis(x, idx, axis=1)

    return {
        "gt_boxes": take(gt_boxes),
        "dp_xy": take(gt["dp_xy"]),
        "dp_i": take(gt["dp_i"]),
        "dp_u": take(gt["dp_u"]),
        "dp_v": take(gt["dp_v"]),
        "dp_point_valid": take(gt["dp_point_valid"]),
        "dp_segm": take(gt["dp_segm"].astype(jnp.int32)),
    }


def select_densepose_rois(
    is_fg: jnp.ndarray,        # (B, S) proposal is foreground
    gt_idx: jnp.ndarray,       # (B, S) matched GT slot per proposal
    dp_valid: jnp.ndarray,     # (B, G) GT slot carries densepose data
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick up to ``capacity`` foreground proposals whose matched GT has
    densepose annotations (the reference trains the densepose head on fg
    proposals with attached gt_densepose; densepose/modeling/roi_heads/
    roi_head.py forward_densepose). Returns (indices, live) per image."""

    def per_image(fg, gidx, dpv):
        want = fg & dpv[gidx]
        order = jnp.argsort(~want)     # wanted first, stable
        idx = order[:capacity]
        return idx.astype(jnp.int32), want[idx]

    return jax.vmap(per_image)(is_fg, gt_idx, dp_valid)


def densepose_losses_from_raw(
    outputs: Dict[str, jnp.ndarray],   # (R, S, S, C) predictor outputs
    roi_boxes: jnp.ndarray,            # (R, 4) xyxy proposal boxes
    roi_live: jnp.ndarray,             # (R,) selected-ROI validity
    gt_boxes: jnp.ndarray,             # (R, 4) xyxy matched GT boxes
    dp_xy: jnp.ndarray,                # (R, P, 2) GT-box-relative [0,1]
    dp_i: jnp.ndarray,                 # (R, P) chart labels
    dp_u: jnp.ndarray,                 # (R, P)
    dp_v: jnp.ndarray,                 # (R, P)
    dp_point_valid: jnp.ndarray,       # (R, P)
    dp_segm: jnp.ndarray,              # (R, Sg, Sg) part raster
    cfg: DensePoseConfig,
) -> Dict[str, jnp.ndarray]:
    """End-to-end chart losses from GT-box-relative raw annotations:
    remap points into each proposal's frame (dropping points outside it,
    ref losses/utils.py j_valid), nearest-resample the part raster to the
    head grid, then apply the chart losses."""
    s = outputs["coarse_segm"].shape[1]
    coords01, inside = remap_points_to_proposals(dp_xy, gt_boxes, roi_boxes)
    points = DensePosePoints(
        coords=jnp.clip(coords01, 0.0, 1.0),
        fine_labels=dp_i,
        u=dp_u,
        v=dp_v,
        valid=dp_point_valid & inside,
    )
    coarse_gt = resample_coarse_segm_gt(
        dp_segm, gt_boxes, roi_boxes, s,
        binarize=cfg.num_coarse_segm_channels == 2,
    )
    return densepose_chart_losses(outputs, points, coarse_gt,
                                  roi_live.astype(bool), cfg)


def point_iuv_errors(
    outputs: Dict[str, jnp.ndarray], points: DensePosePoints,
) -> Dict[str, jnp.ndarray]:
    """Point-level diagnostics (I-accuracy, mean |dU|, |dV|) — the offline
    GPS metric needs SMPL geodesic tables that cannot be bundled."""
    fine_at = chart_point_sample(outputs["fine_segm"], points.coords)
    i_pred = jnp.argmax(fine_at, axis=-1)
    live = points.valid & (points.fine_labels > 0)
    n = jnp.maximum(jnp.sum(live), 1.0)
    acc = jnp.sum((i_pred == points.fine_labels) * live) / n
    ch = jnp.clip(points.fine_labels, 0, outputs["u"].shape[-1] - 1)
    u_at = jnp.take_along_axis(
        chart_point_sample(outputs["u"], points.coords), ch[..., None], -1
    )[..., 0]
    v_at = jnp.take_along_axis(
        chart_point_sample(outputs["v"], points.coords), ch[..., None], -1
    )[..., 0]
    return {
        "i_accuracy": acc,
        "u_mae": jnp.sum(jnp.abs(u_at - points.u) * live) / n,
        "v_mae": jnp.sum(jnp.abs(v_at - points.v) * live) / n,
    }
