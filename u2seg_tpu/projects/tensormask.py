"""TensorMask: dense sliding-window instance segmentation.

Counterpart of ``projects/TensorMask`` in the reference. The project's one
custom native op is SwapAlign2Nat (layers/csrc/SwapAlign2Nat_cuda.cu, the op
of arXiv:1903.12174): given aligned mask predictions (N, V*U, H, W) it swaps
the unit lengths of the window axes (V, U) and the spatial axes (H, W) by a
factor ``lambda`` and converts the representation from aligned (window
relative to its own pixel) to natural (window on the image grid), with
quadrilinear interpolation and ``pad_val`` outside the tensor.

TPU formulation: the CUDA kernel's 16-tap quadrilinear sample is SEPARABLE —
each output element's weight is a product of four per-axis linear weights,
and a tap is dropped iff any axis coordinate is out of range, so the total
in-bounds weight also factorizes per axis. That turns the whole op into four
einsum contractions (MXU matmuls) over per-axis weight matrices plus one
rank-factored pad correction — no scatter/gather, autodiff gives the exact
backward (the reference ships a second 400-line CUDA kernel for it).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _axis_weights(coords: np.ndarray, size: int) -> np.ndarray:
    """Linear-interp weight matrix W[out, size] for sample positions
    ``coords`` (out,): floor/ceil taps with out-of-range taps dropped.
    Returns a dense constant matrix (computed host-side; shapes static)."""
    out = coords.shape[0]
    w = np.zeros((out, size), np.float32)
    f = np.floor(coords).astype(np.int64)
    c = np.ceil(coords).astype(np.int64)
    wc = coords - f
    wf = 1.0 - wc
    for i in range(out):
        if 0 <= f[i] < size:
            w[i, f[i]] += wf[i]
        if 0 <= c[i] < size:
            w[i, c[i]] += wc[i]
    return w


def swap_align2nat(x: jnp.ndarray, lambda_val: int,
                   pad_val: float = -6.0) -> jnp.ndarray:
    """(N, H, W, V*U) aligned masks -> (N, H', W', V'*U') natural masks,
    V' = lambda*V, H' = ceil(H/lambda) (channels-last; the reference op is
    NCHW with C = V*U, V == U a square count).

    Sampling (matching SwapAlign2Nat_cuda.cu exactly): output (v, u, y, x)
    reads input at spatial (y*l + v - V'/2 + 0.5, x*l + u - U'/2 + 0.5) and
    window ((v+0.5)/l - 0.5, (u+0.5)/l - 0.5), quadrilinear, pad outside.
    """
    n, hin, win_, c = x.shape
    vin = int(math.isqrt(c))
    assert vin * vin == c, "#channels must be a square number"
    uin = vin
    lam = float(lambda_val)
    vout, uout = lambda_val * vin, lambda_val * uin
    hout = int(math.ceil(hin / lam))
    wout = int(math.ceil(win_ / lam))

    # per-axis weight matrices (static constants)
    ov = (np.arange(vout) + 0.5) / lam - 0.5
    wv = _axis_weights(ov, vin)                     # (Vout, Vin)
    wu = _axis_weights((np.arange(uout) + 0.5) / lam - 0.5, uin)
    # spatial coords depend on (y, v) jointly: oy = y*l + v - Vout/2 + 0.5
    oy = (np.arange(hout)[:, None] * lam
          + np.arange(vout)[None, :] - vout / 2.0 + 0.5)   # (Hout, Vout)
    wy = np.stack([_axis_weights(oy[:, v], hin) for v in range(vout)], 0)
    ox = (np.arange(wout)[:, None] * lam
          + np.arange(uout)[None, :] - uout / 2.0 + 0.5)
    wx = np.stack([_axis_weights(ox[:, u], win_) for u in range(uout)], 0)

    xs = x.astype(jnp.float32).reshape(n, hin, win_, vin, uin)
    # contract window axes (small), then spatial axes (v/u-dependent)
    t = jnp.einsum("Vi,nyxiu->nyxVu", jnp.asarray(wv), xs)
    t = jnp.einsum("Uu,nyxVu->nyxVU", jnp.asarray(wu), t)
    t = jnp.einsum("VYy,nyxVU->nYxVU", jnp.asarray(wy), t)
    t = jnp.einsum("UXx,nYxVU->nYXVU", jnp.asarray(wx), t)

    # pad correction: total in-bounds weight factorizes per axis
    sv = wv.sum(1)                                   # (Vout,)
    su = wu.sum(1)
    sy = wy.sum(2)                                   # (Vout, Hout)
    sx = wx.sum(2)                                   # (Uout, Wout)
    inside = (
        sv[None, None, :, None] * su[None, None, None, :]
        * sy.T[:, None, :, None] * sx.T[None, :, None, :]
    )                                                # (Hout, Wout, Vout, Uout)
    t = t + pad_val * (1.0 - jnp.asarray(inside))[None]
    return t.reshape(n, hout, wout, vout * uout)


class SwapAlign2Nat:
    """Module-style wrapper matching the reference layer's interface."""

    def __init__(self, lambda_val: int, pad_val: float = -6.0):
        assert lambda_val >= 1
        self.lambda_val = lambda_val
        self.pad_val = pad_val

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return swap_align2nat(x, self.lambda_val, self.pad_val)


# ---------------------------------------------------------------------------
# TensorMask meta-architecture (ref tensormask/arch.py:301-913): dense
# sliding-window instance segmentation. TPU formulation: the reference's
# ragged per-(level, anchor) GT lists become ONE fixed-capacity foreground
# slot table; the assignment rule (:40-137: containment + scale + centrality,
# multi-match -> background) is a vectorized (G, M) predicate; mask windows
# are gathered/padded per static (level, size) pair.
# ---------------------------------------------------------------------------

import dataclasses
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax

from u2seg_tpu.ops import losses as L
from u2seg_tpu.structures import boxes as box_ops
from u2seg_tpu.structures.instances import GtInstances


@dataclasses.dataclass
class TensorMaskConfig:
    """MODEL.TENSOR_MASK defaults (ref tensormask/config.py)."""

    num_classes: int = 80
    in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6", "p7")
    num_convs: int = 4
    cls_channels: int = 256
    bbox_channels: int = 128
    mask_channels: int = 128
    # base window sizes at the finest level, in units of its stride
    # (ref: ANCHOR_GENERATOR.SIZES[0] // stride, e.g. [44, 60] / 4)
    mask_sizes: Sequence[int] = (11, 15)
    focal_alpha: float = 0.3
    focal_gamma: float = 3.0
    bbox_reg_weights: Sequence[float] = (1.5, 1.5, 0.75, 0.75)
    mask_loss_weight: float = 2.0
    mask_pos_weight: float = 1.5
    align_on: bool = True
    bipyramid_on: bool = True
    score_thresh: float = 0.05
    topk_candidates: int = 6000
    nms_thresh: float = 0.5
    max_detections: int = 100
    mask_out_size: int = 28          # fixed box-relative output patch
    max_fg: int = 64                 # static foreground-anchor capacity


def _focal_loss_star(logits, targets, alpha, gamma):
    """fvcore sigmoid_focal_loss_star (the * variant used by TensorMask)."""
    shifted = gamma * (logits * (2.0 * targets - 1.0))
    loss = -jax.nn.log_sigmoid(shifted) / gamma
    if alpha >= 0:
        loss = loss * (targets * alpha + (1.0 - targets) * (1.0 - alpha))
    return loss


def tensormask_assign(gt: GtInstances, anchors, units, min_anchor_size,
                      scale_thresh: float = 2.0, spatial_thresh: float = 1.0):
    """Vectorized assignment rule (ref arch.py:40-137). anchors (M, 4) for
    ONE image; gt fixed-capacity with validity. Returns (matches (M,),
    fg (M,) bool): an anchor is foreground iff it fully contains its GT,
    is no larger than 2x the GT's long side (with a small-object floor),
    its center is within one unit of the GT center, and it satisfies those
    tests for exactly ONE GT (uniqueness -> background)."""
    gb = gt.boxes                                       # (G, 4)
    lt_ok = (anchors[None, :, :2] <= gb[:, None, :2]).all(-1)
    rb_ok = (anchors[None, :, 2:] >= gb[:, None, 2:]).all(-1)
    contain = lt_ok & rb_ok                             # (G, M)

    gt_long = jnp.maximum(gb[:, 2] - gb[:, 0], gb[:, 3] - gb[:, 1])
    gt_upper = jnp.maximum(gt_long * scale_thresh, min_anchor_size)
    anc_size = jnp.maximum(
        anchors[:, 2] - anchors[:, 0], anchors[:, 3] - anchors[:, 1]
    ) - units
    scale_ok = gt_upper[:, None] >= anc_size[None, :]

    gc = (gb[:, :2] + gb[:, 2:]) / 2.0
    ac = (anchors[:, :2] + anchors[:, 2:]) / 2.0
    off = (gc[:, None, :] - ac[None, :, :]) / units[None, :, None]
    spatial_ok = jnp.sum(off * off, -1) <= spatial_thresh ** 2

    assign = contain & scale_ok & spatial_ok & gt.valid[:, None]
    n_match = jnp.sum(assign, 0)                        # (M,)
    matches = jnp.argmax(assign, 0).astype(jnp.int32)
    fg = n_match == 1                                   # uniqueness rule
    return matches, fg


def _crop_gt_mask(gt_patch, gt_box, anchor_box, out_size):
    """Rasterize one GT's box-relative mask patch over an anchor window
    (the reference's BitMasks.crop_and_resize on the anchor box)."""
    p = gt_patch.shape[0]
    # anchor-window pixel centers in gt-box-normalized coords
    r = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    ys = anchor_box[1] + r * (anchor_box[3] - anchor_box[1])
    xs = anchor_box[0] + r * (anchor_box[2] - anchor_box[0])
    gy = (ys - gt_box[1]) / jnp.maximum(gt_box[3] - gt_box[1], 1e-6)
    gx = (xs - gt_box[0]) / jnp.maximum(gt_box[2] - gt_box[0], 1e-6)
    # bilinear sample the patch (align_corners=False), 0 outside
    py = gy * p - 0.5
    px = gx * p - 0.5
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)[:, None]
    fx = (px - x0)[None, :]

    def tap(yi, xi):
        ok = (yi >= 0) & (yi < p)
        oky = ok[:, None]
        okx = ((xi >= 0) & (xi < p))[None, :]
        v = gt_patch[jnp.clip(yi, 0, p - 1)][:, jnp.clip(xi, 0, p - 1)]
        return v * oky * okx

    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    val = (tap(y0i, x0i) * (1 - fy) * (1 - fx)
           + tap(y0i, x0i + 1) * (1 - fy) * fx
           + tap(y0i + 1, x0i) * fy * (1 - fx)
           + tap(y0i + 1, x0i + 1) * fy * fx)
    return (val >= 0.5).astype(jnp.float32)


class TensorMaskHead(nn.Module):
    """cls/box/mask towers + per-window-size mask predictors + bipyramid
    fuse + SwapAlign2Nat (ref arch.py:754-913)."""

    cfg: TensorMaskConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        c = self.cfg
        init = nn.initializers.normal(0.01)
        prior_bias = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        num_anchors = len(c.mask_sizes)

        def tower(name, ch):
            convs = [
                nn.Conv(ch, (3, 3), padding="SAME", kernel_init=init,
                        dtype=self.dtype, name=f"{name}{i}")
                for i in range(c.num_convs)
            ]

            def run(x):
                for conv in convs:
                    x = nn.relu(conv(x))
                return x

            return run

        cls_tower = tower("cls_subnet", c.cls_channels)
        box_tower = tower("bbox_subnet", c.bbox_channels)
        cls_score = nn.Conv(num_anchors * c.num_classes, (3, 3),
                            padding="SAME", kernel_init=init,
                            bias_init=prior_bias, name="cls_score")
        bbox_pred = nn.Conv(num_anchors * 4, (3, 3), padding="SAME",
                            kernel_init=init, name="bbox_pred")

        logits = [cls_score(cls_tower(f)).astype(jnp.float32)
                  for f in features]
        deltas = [bbox_pred(box_tower(f)).astype(jnp.float32)
                  for f in features]

        mask_tower = tower("mask_subnet", c.mask_channels)
        mask_feats = [mask_tower(f) for f in features]
        if c.bipyramid_on:
            # upsample every level's mask features to the finest grid, add
            # the finest, fuse (ref arch.py:884-897)
            h0, w0 = mask_feats[0].shape[1:3]
            fuse = nn.Conv(c.mask_channels, (3, 3), padding="SAME",
                           kernel_init=init, dtype=self.dtype,
                           name="mask_fuse")
            fused = []
            for lvl, mf in enumerate(mask_feats):
                if lvl > 0:
                    b, h, w, ch = mf.shape
                    lam = 2 ** lvl
                    mf = jax.image.resize(
                        mf, (b, h * lam, w * lam, ch), "bilinear"
                    )[:, :h0, :w0]
                fused.append(nn.relu(fuse(mf + mask_feats[0])))
            mask_feats = fused
        preds = {
            m: nn.Conv(m * m, (1, 1), kernel_init=init, name=f"mask_pred_{m:02d}")
            for m in c.mask_sizes
        }
        masks = []
        for lvl, mf in enumerate(mask_feats):
            lam = 2 ** lvl if c.bipyramid_on else 1
            row = []
            for m in c.mask_sizes:
                pm = preds[m](mf).astype(jnp.float32)
                if c.align_on:
                    pm = swap_align2nat(pm, lam)
                row.append(pm)
            masks.append(row)
        return logits, deltas, masks


class TensorMask(nn.Module):
    """Meta-arch over FPN features (ref arch.py:301-753). Returns losses in
    training; (boxes, scores, classes, mask patches, valid) at inference."""

    cfg: TensorMaskConfig
    strides: Optional[Dict[str, int]] = None
    dtype: jnp.dtype = jnp.float32

    def _anchor_table(self, shapes):
        """Static per-level anchors: (M, 4) boxes, units, provenance."""
        c = self.cfg
        from u2seg_tpu.models.fpn import FPN_STRIDES

        strides = self.strides or FPN_STRIDES
        boxes, units, prov = [], [], []
        for lvl, f in enumerate(c.in_features):
            s = strides[f]
            h, w = shapes[lvl]
            ys = (np.arange(h) + 0.5) * s
            xs = (np.arange(w) + 0.5) * s
            for a, m in enumerate(c.mask_sizes):
                side = m * s
                cy, cx = np.meshgrid(ys, xs, indexing="ij")
                b = np.stack([cx - side / 2, cy - side / 2,
                              cx + side / 2, cy + side / 2], -1)
                boxes.append(b.reshape(-1, 4))
                units.append(np.full(h * w, s, np.float32))
                lin = np.arange(h * w)
                prov.append(np.stack([
                    np.full(h * w, lvl), np.full(h * w, a),
                    lin // w, lin % w,
                ], -1))
        return (jnp.asarray(np.concatenate(boxes).astype(np.float32)),
                jnp.asarray(np.concatenate(units)),
                jnp.asarray(np.concatenate(prov).astype(np.int32)))

    @nn.compact
    def __call__(self, features, image_sizes, gt: Optional[GtInstances] = None,
                 train: bool = False):
        c = self.cfg
        feats = [features[f] for f in c.in_features]
        logits_l, deltas_l, masks_l = TensorMaskHead(
            c, self.dtype, name="head"
        )(feats)
        shapes = [f.shape[1:3] for f in feats]
        anchors, units, prov = self._anchor_table(shapes)
        b = feats[0].shape[0]
        k = c.num_classes
        logits = jnp.concatenate([
            x.reshape(b, x.shape[1] * x.shape[2], len(c.mask_sizes), k)
            .transpose(0, 2, 1, 3).reshape(b, -1, k)
            for x in logits_l
        ], 1)
        deltas = jnp.concatenate([
            x.reshape(b, x.shape[1] * x.shape[2], len(c.mask_sizes), 4)
            .transpose(0, 2, 1, 3).reshape(b, -1, 4)
            for x in deltas_l
        ], 1)
        # NOTE: anchor table is ordered (level, anchor, cell); the per-level
        # reshape above must match — it produces (anchor, cell) within each
        # level, so transpose cell/anchor to (anchor-major) order.
        if train:
            assert gt is not None
            return self._losses(logits, deltas, masks_l, anchors, units,
                                prov, gt)
        return self._inference(logits, deltas, masks_l, anchors, prov,
                               image_sizes)

    def _losses(self, logits, deltas, masks_l, anchors, units, prov, gt):
        from u2seg_tpu.models.fpn import FPN_STRIDES

        c = self.cfg
        b = logits.shape[0]
        strides = self.strides or FPN_STRIDES
        min_anchor = min(c.mask_sizes) * min(
            strides[f] for f in c.in_features
        )

        def per_image(gt_i):
            return tensormask_assign(gt_i, anchors, units, float(min_anchor))

        matches, fg = jax.vmap(per_image)(gt)            # (B, M)
        num_fg = jnp.maximum(jnp.sum(fg), 1.0)

        # focal* classification over all anchors
        cls = jnp.take_along_axis(gt.classes, matches, axis=1)
        cls = jnp.where(fg, cls, -1)
        tgt = jax.nn.one_hot(cls, c.num_classes, dtype=jnp.float32)
        loss_cls = jnp.sum(_focal_loss_star(
            logits, tgt, c.focal_alpha, c.focal_gamma
        )) / num_fg

        # box regression (L1 on fg)
        mb = jnp.take_along_axis(
            gt.boxes, matches[..., None], axis=1
        )                                                  # (B, M, 4)
        t = box_ops.get_deltas(
            jnp.broadcast_to(anchors, mb.shape).reshape(-1, 4),
            mb.reshape(-1, 4), tuple(c.bbox_reg_weights),
        ).reshape(mb.shape)
        loss_box = jnp.sum(
            jnp.abs(deltas - t) * fg[..., None]
        ) / num_fg

        # mask BCE on a fixed-capacity fg slot table
        f_cap = c.max_fg
        score = fg.reshape(-1).astype(jnp.float32) * 1e6 - jnp.arange(
            fg.size, dtype=jnp.float32
        )
        _, slot = jax.lax.top_k(score, min(f_cap, fg.size))
        slot_img = (slot // fg.shape[1]).astype(jnp.int32)
        slot_anchor = (slot % fg.shape[1]).astype(jnp.int32)
        slot_fg = fg.reshape(-1)[slot]
        slot_gt = matches.reshape(-1)[slot]                # gt index
        slot_prov = prov[slot_anchor]                      # (F, 4)
        slot_box = anchors[slot_anchor]

        gt_boxes_s = gt.boxes[slot_img, slot_gt]
        gt_patch_s = gt.masks[slot_img, slot_gt]           # (F, P, P)

        loss_mask = 0.0
        num_levels = len(c.in_features)
        for lvl in range(num_levels):
            lam = 2 ** lvl if c.bipyramid_on else 1
            for a, m in enumerate(c.mask_sizes):
                size = m * lam if c.align_on else m
                pm = masks_l[lvl][a]                       # (B,H,W,size^2)
                hw = pm.shape[1] * pm.shape[2]
                flat = pm.reshape(b * hw, size * size)
                lin = (slot_img * hw + slot_prov[:, 2] * pm.shape[2]
                       + slot_prov[:, 3])
                pred = flat[jnp.clip(lin, 0, b * hw - 1)]  # (F, size^2)
                gt_win = jax.vmap(
                    lambda p_, g_, a_: _crop_gt_mask(p_, g_, a_, size)
                )(gt_patch_s, gt_boxes_s, slot_box).reshape(-1, size * size)
                sel = slot_fg & (slot_prov[:, 0] == lvl) & (slot_prov[:, 1] == a)
                x = pred
                per = (c.mask_pos_weight * gt_win * jax.nn.softplus(-x)
                       + (1.0 - gt_win) * jax.nn.softplus(x))
                loss_mask += jnp.sum(
                    per * sel[:, None]
                ) * (c.mask_loss_weight / (size * size))
        loss_mask = loss_mask / num_fg
        return {"loss_cls": loss_cls, "loss_box_reg": loss_box,
                "loss_mask": loss_mask}

    def _inference(self, logits, deltas, masks_l, anchors, prov, image_sizes):
        from u2seg_tpu.ops.nms import batched_nms

        c = self.cfg
        b, m_tot, k = logits.shape

        def one(logit, delta, hw):
            scores = jax.nn.sigmoid(logit).reshape(-1)
            scores = jnp.where(scores > c.score_thresh, scores, 0.0)
            cand = min(c.topk_candidates, scores.shape[0])
            top_s, top_i = jax.lax.top_k(scores, cand)
            a_i = (top_i // k).astype(jnp.int32)
            cls_i = (top_i % k).astype(jnp.int32)
            boxes = box_ops.apply_deltas(
                delta[a_i], anchors[a_i], tuple(c.bbox_reg_weights)
            )
            boxes = box_ops.clip(boxes, hw)
            nms_scores = jnp.where(top_s > 0.0, top_s, -jnp.inf)
            keep_i, keep_valid = batched_nms(
                boxes, nms_scores, cls_i, c.nms_thresh, c.max_detections
            )
            return (top_s[keep_i] * keep_valid, boxes[keep_i],
                    cls_i[keep_i], a_i[keep_i])

        scores, boxes, classes, anchor_ids = jax.vmap(one)(
            logits, deltas, image_sizes
        )
        valid = scores > 0.0

        # extract each detection's natural-rep window, resize to the fixed
        # box-relative patch (per static (level, size) source)
        r = c.mask_out_size
        det = boxes.shape[1]
        patches = jnp.zeros((b, det, r, r), jnp.float32)
        det_prov = prov[anchor_ids]                        # (B, D, 4)
        for lvl in range(len(c.in_features)):
            lam = 2 ** lvl if c.bipyramid_on else 1
            for a, m in enumerate(c.mask_sizes):
                size = m * lam if c.align_on else m
                pm = masks_l[lvl][a]
                hw = pm.shape[1] * pm.shape[2]
                flat = pm.reshape(-1, size * size)
                lin = (jnp.arange(b)[:, None] * hw
                       + det_prov[..., 2] * pm.shape[2] + det_prov[..., 3])
                win = flat[jnp.clip(lin.reshape(-1), 0, b * hw - 1)]
                win = win.reshape(b * det, size, size, 1)
                win = jax.image.resize(win, (b * det, r, r, 1), "bilinear")
                win = win.reshape(b, det, r, r)
                sel = (det_prov[..., 0] == lvl) & (det_prov[..., 1] == a)
                patches = jnp.where(sel[..., None, None], win, patches)
        return {
            "boxes": boxes, "scores": scores, "classes": classes,
            "valid": valid, "mask_patches": jax.nn.sigmoid(patches),
            "mask_src_boxes": jnp.take_along_axis(
                jnp.broadcast_to(anchors, (b,) + anchors.shape),
                anchor_ids[..., None], axis=1,
            ),
        }
