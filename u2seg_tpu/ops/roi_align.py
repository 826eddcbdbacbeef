"""ROIAlign for TPU.

Counterpart of the reference's torchvision CUDA ``roi_align``
(``detectron2/layers/roi_align.py:3``, ROIAlignV2 ``aligned=True`` semantics)
and ``detectron2/modeling/poolers.py`` (ROIPooler :114,
assign_boxes_to_levels :23).

TPU design: one fused gather + bilinear formulation. For each ROI we compute a
static (S*r)x(S*r) grid of sample points, gather the 4 neighbouring feature
vectors for each point from the (flattened) feature map, blend with bilinear
weights and average-pool r x r samples per output bin. All shapes are static;
invalid ROIs simply gather garbage which callers mask. Differentiable (XLA
scatter-add gradient). A Pallas kernel path can slot in behind the same API.

Layout: features are NHWC (TPU-native).
"""
from __future__ import annotations

import math

import numpy as np
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _sample_coords_1d(start, bin_size, num_bins: int, ratio: int):
    """Centers of `ratio` samples in each of `num_bins` bins along one axis.

    start: (...,) roi start coordinate (already scaled, aligned-adjusted)
    bin_size: (...,) size of one bin
    Returns (..., num_bins * ratio).
    """
    # sample s in bin b at: start + (b + (s + .5)/ratio) * bin_size
    offs = (jnp.arange(num_bins * ratio) // ratio).astype(jnp.float32)
    sub = ((jnp.arange(num_bins * ratio) % ratio).astype(jnp.float32) + 0.5) / ratio
    rel = offs + sub  # (num_bins*ratio,)
    return start[..., None] + rel * bin_size[..., None]


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    batch_idx: jnp.ndarray,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:
    """ROIAlign on an NHWC feature map.

    Args:
      features: (B, H, W, C).
      boxes: (R, 4) XYXY in input-image coordinates.
      batch_idx: (R,) int32 image index per ROI.
      output_size: S — output is (R, C, S, S)?  No: returns (R, C, S, S) to
        mirror the reference op's NCHW output? We return (R, S, S, C) —
        TPU-native; heads expect channels-last.
      spatial_scale: multiply box coords by this to map to feature coords.
      sampling_ratio: samples per bin per axis; 0 means "adaptive" in the
        reference — here statically mapped to 2 (the common configured value;
        XLA requires static sample counts).
      aligned: if True, shift by -0.5 (ROIAlignV2, ref roi_align.py:36-57).

    Returns:
      (R, S, S, C) float32 pooled features.
    """
    if sampling_ratio <= 0:
        sampling_ratio = 2
    s, r = output_size, sampling_ratio
    b, h, w, c = features.shape
    n_roi = boxes.shape[0]

    boxes = boxes.astype(jnp.float32) * spatial_scale
    off = 0.5 if aligned else 0.0
    x0 = boxes[:, 0] - off
    y0 = boxes[:, 1] - off
    roi_w = boxes[:, 2] - boxes[:, 0]
    roi_h = boxes[:, 3] - boxes[:, 1]
    if not aligned:  # legacy: clamp minimum roi size to 1 (ref _cpu rois >= 1)
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / s
    bin_h = roi_h / s

    xs = _sample_coords_1d(x0, bin_w, s, r)  # (R, s*r)
    ys = _sample_coords_1d(y0, bin_h, s, r)  # (R, s*r)

    # Bilinear corners & weights along each axis (separable).
    def axis_interp(coords, size):
        # Matches reference bilinear_interpolate (ROIAlign_cpu.cpp): points
        # with coord < -1 or > size contribute 0; coords clamped to [0, size-1].
        inside = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1)
        lo = jnp.floor(cc)
        frac = cc - lo
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, size - 1)
        w_lo = jnp.where(inside, 1.0 - frac, 0.0)
        w_hi = jnp.where(inside, frac, 0.0)
        return lo_i, hi_i, w_lo, w_hi

    yx0, yx1, wy0, wy1 = axis_interp(ys, h)  # (R, s*r)
    xx0, xx1, wx0, wx1 = axis_interp(xs, w)

    feats_flat = features.reshape(b * h * w, c)
    base = batch_idx.astype(jnp.int32) * (h * w)  # (R,)

    def gather_hw(yi, xi):
        # yi: (R, s*r), xi: (R, s*r) -> (R, s*r, s*r, C)
        lin = base[:, None, None] + yi[:, :, None] * w + xi[:, None, :]
        return jnp.take(feats_flat, lin.reshape(-1), axis=0).reshape(
            n_roi, s * r, s * r, c
        )

    v00 = gather_hw(yx0, xx0)
    v01 = gather_hw(yx0, xx1)
    v10 = gather_hw(yx1, xx0)
    v11 = gather_hw(yx1, xx1)

    wy0e = wy0[:, :, None, None]
    wy1e = wy1[:, :, None, None]
    wx0e = wx0[:, None, :, None]
    wx1e = wx1[:, None, :, None]
    samples = (
        v00 * (wy0e * wx0e)
        + v01 * (wy0e * wx1e)
        + v10 * (wy1e * wx0e)
        + v11 * (wy1e * wx1e)
    )  # (R, s*r, s*r, C)

    # Average-pool r x r samples per bin.
    samples = samples.reshape(n_roi, s, r, s, r, c)
    return jnp.mean(samples, axis=(2, 4))


def assign_boxes_to_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level assignment (eq. 1 of FPN paper; ref poolers.py:23-61).

    Returns (R,) int32 levels in [min_level, max_level].
    """
    from u2seg_tpu.structures import boxes as box_ops

    sqrt_area = jnp.sqrt(jnp.maximum(box_ops.area(boxes), 1e-12))
    lvl = jnp.floor(
        canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8)
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    batch_idx: jnp.ndarray,
    output_size: int,
    strides: Sequence[int],
    sampling_ratio: int = 0,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """ROIPooler: route each ROI to its FPN level and ROIAlign there.

    TPU formulation: every level's feature map is flattened into ONE
    (B * sum_l H_l*W_l, C) buffer; each ROI computes its bilinear corner
    indices inside its assigned level (per-ROI h/w/stride picked from small
    constant tables) offset by the level's start — so the whole pooler is a
    single gather, with no per-level partitioning (ref poolers.py:114-263)
    and no wasted pooling of unrouted levels.

    Args:
      features: list of (B, H_l, W_l, C) maps, ordered fine→coarse.
      strides: feature stride per level (e.g. [4, 8, 16, 32]).
    Returns:
      (R, S, S, C) float32.
    """
    if sampling_ratio <= 0:
        sampling_ratio = 2
    s, r = output_size, sampling_ratio
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    levels = assign_boxes_to_levels(
        boxes, min_level, max_level, canonical_box_size, canonical_level
    )
    lvl = levels - min_level                                 # (R,) 0-based

    b = features[0].shape[0]
    c = features[0].shape[-1]
    n_roi = boxes.shape[0]
    hs = np.array([f.shape[1] for f in features], np.int32)
    ws = np.array([f.shape[2] for f in features], np.int32)
    sizes = hs * ws
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    total = int(offsets[-1])

    flat = jnp.concatenate(
        [f.reshape(b, -1, c) for f in features], axis=1
    ).reshape(b * total, c)

    h_r = jnp.asarray(hs)[lvl].astype(jnp.float32)           # (R,)
    w_r = jnp.asarray(ws)[lvl].astype(jnp.float32)
    off_r = jnp.asarray(offsets[:-1])[lvl]                   # (R,)
    stride_r = jnp.asarray(np.asarray(strides, np.float32))[lvl]
    w_int = jnp.asarray(ws)[lvl]                             # (R,) int32

    fb = boxes.astype(jnp.float32) / stride_r[:, None]
    x0 = fb[:, 0] - 0.5
    y0 = fb[:, 1] - 0.5
    bin_w = (fb[:, 2] - fb[:, 0]) / s
    bin_h = (fb[:, 3] - fb[:, 1]) / s

    xs = _sample_coords_1d(x0, bin_w, s, r)                  # (R, s*r)
    ys = _sample_coords_1d(y0, bin_h, s, r)

    def axis_interp(coords, size):
        inside = (coords >= -1.0) & (coords <= size[:, None])
        cc = jnp.clip(coords, 0.0, size[:, None] - 1)
        lo = jnp.floor(cc)
        frac = cc - lo
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, size[:, None].astype(jnp.int32) - 1)
        w_lo = jnp.where(inside, 1.0 - frac, 0.0)
        w_hi = jnp.where(inside, frac, 0.0)
        return lo_i, hi_i, w_lo, w_hi

    yx0, yx1, wy0, wy1 = axis_interp(ys, h_r)
    xx0, xx1, wx0, wx1 = axis_interp(xs, w_r)

    base = batch_idx.astype(jnp.int32) * total + off_r       # (R,)

    def gather_hw(yi, xi):
        lin = base[:, None, None] + yi[:, :, None] * w_int[:, None, None] \
            + xi[:, None, :]
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(
            n_roi, s * r, s * r, c
        )

    v00 = gather_hw(yx0, xx0)
    v01 = gather_hw(yx0, xx1)
    v10 = gather_hw(yx1, xx0)
    v11 = gather_hw(yx1, xx1)

    wy0e = wy0[:, :, None, None]
    wy1e = wy1[:, :, None, None]
    wx0e = wx0[:, None, :, None]
    wx1e = wx1[:, None, :, None]
    samples = (
        v00 * (wy0e * wx0e)
        + v01 * (wy0e * wx1e)
        + v10 * (wy1e * wx0e)
        + v11 * (wy1e * wx1e)
    )
    samples = samples.reshape(n_roi, s, r, s, r, c)
    return jnp.mean(samples, axis=(2, 4))


def roi_align_rotated(
    features: jnp.ndarray,     # (B, H, W, C)
    rois: jnp.ndarray,         # (R, 5): (cx, cy, w, h, angle_deg CCW)
    batch_idx: jnp.ndarray,    # (R,) int32
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
) -> jnp.ndarray:
    """ROIAlignRotated (ref layers/csrc/ROIAlignRotated_cuda.cu:160-230,
    always aligned=True): the bin sample grid is laid out in the box frame
    (centered, axis-aligned) then rotated by ``angle`` and translated to the
    box center. The rotation couples the two axes, so unlike ``roi_align``
    the bilinear weights don't factorize — each sample gathers its 4
    corners. Boundary semantics match ROIAlign: samples outside
    [-1, size] contribute 0; in-range coords clamp into [0, size-1].

    Static shapes: sampling_ratio<=0 (reference: adaptive ceil(h/s)) is
    fixed to 2, same convention as ``roi_align``. Returns (R, S, S, C) f32.
    """
    if sampling_ratio <= 0:
        sampling_ratio = 2
    s, r = output_size, sampling_ratio
    b, h, w, c = features.shape
    n_roi = rois.shape[0]

    cx = rois[:, 0] * spatial_scale - 0.5
    cy = rois[:, 1] * spatial_scale - 0.5
    rw = rois[:, 2] * spatial_scale
    rh = rois[:, 3] * spatial_scale
    theta = rois[:, 4] * (np.pi / 180.0)
    cos_t = jnp.cos(theta)[:, None, None]
    sin_t = jnp.sin(theta)[:, None, None]

    # sample offsets in the box frame, relative to the box center
    rel = _sample_coords_1d(jnp.zeros_like(cx), jnp.ones_like(cx), s, r)
    yy = (-rh / 2.0)[:, None] + rel * (rh / s)[:, None]      # (R, n)
    xx = (-rw / 2.0)[:, None] + rel * (rw / s)[:, None]
    # rotate around the center and translate (full (R, n, n) grid)
    ys = yy[:, :, None] * cos_t - xx[:, None, :] * sin_t + cy[:, None, None]
    xs = yy[:, :, None] * sin_t + xx[:, None, :] * cos_t + cx[:, None, None]

    inside = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    flat = features.reshape(b * h * w, c)
    base = (batch_idx.astype(jnp.int32) * h * w)[:, None, None]

    def gather(yi, xi):
        lin = base + yi * w + xi
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(
            n_roi, s * r, s * r, c
        ).astype(jnp.float32)

    wgt = lambda a: a[..., None]
    samples = (
        gather(y0i, x0i) * wgt((1 - fy) * (1 - fx))
        + gather(y0i, x1i) * wgt((1 - fy) * fx)
        + gather(y1i, x0i) * wgt(fy * (1 - fx))
        + gather(y1i, x1i) * wgt(fy * fx)
    ) * wgt(inside.astype(jnp.float32))
    samples = samples.reshape(n_roi, s, r, s, r, c)
    return jnp.mean(samples, axis=(2, 4))


def multilevel_roi_align_rotated(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,         # (R, 5)
    batch_idx: jnp.ndarray,
    output_size: int,
    strides: Sequence[int],
    sampling_ratio: int = 0,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Rotated ROIPooler: level routing by sqrt(w*h) (the reference routes
    rotated boxes through the same ROIPooler heuristic, poolers.py:114),
    then ROIAlignRotated on every ROI at its level. Rotated grids aren't
    separable, so this pools every level and selects per ROI — levels are
    few (4) and the small rotated-head capacities keep this cheap."""
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    # level assignment uses sqrt(area): synthesize XYXY extents around center
    half_w = rois[:, 2] / 2.0
    half_h = rois[:, 3] / 2.0
    xyxy = jnp.stack([
        rois[:, 0] - half_w, rois[:, 1] - half_h,
        rois[:, 0] + half_w, rois[:, 1] + half_h,
    ], axis=1)
    levels = assign_boxes_to_levels(
        xyxy, min_level, max_level, canonical_box_size, canonical_level
    )
    lvl = levels - min_level
    outs = [
        roi_align_rotated(f, rois, batch_idx, output_size,
                          1.0 / float(st), sampling_ratio)
        for f, st in zip(features, strides)
    ]
    stacked = jnp.stack(outs, axis=0)             # (L, R, S, S, C)
    return jnp.take_along_axis(
        stacked, lvl[None, :, None, None, None], axis=0
    )[0]
