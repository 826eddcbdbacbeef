"""One-stage dense detectors: RetinaNet & FCOS.

Counterpart of ``detectron2/modeling/meta_arch/dense_detector.py:27``,
``retinanet.py:29`` and ``fcos.py:25``. Static-shape TPU formulations:
per-level top-k candidates -> class-aware NMS with fixed capacities.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.config.config import (
    AnchorConfig, FCOSConfig, RetinaNetConfig,
)
from u2seg_tpu.models import matcher
from u2seg_tpu.models.anchors import multilevel_anchors
from u2seg_tpu.models.fpn import FPN_STRIDES
from u2seg_tpu.ops import losses as L
from u2seg_tpu.ops.nms import batched_nms
from u2seg_tpu.structures import boxes as box_ops
from u2seg_tpu.structures.instances import Detections, GtInstances


class DenseHead(nn.Module):
    """Shared 4-conv cls & box towers (ref retinanet.py RetinaNetHead).

    ``norm`` adds a norm after every tower conv (the head-BN variants of
    projects/Rethinking-BatchNorm); ``shared_levels_bn`` normalizes ALL
    pyramid levels with one set of moments (its SharedTraining variant).
    With norms, the same norm module is applied to every level (shared
    params; in training the stored running stats are the last level's —
    the cross-level stats discrepancy is exactly that project's subject).
    """

    num_classes: int
    num_anchors: int
    conv_dims: Tuple[int, ...] = (256, 256, 256, 256)
    prior_prob: float = 0.01
    with_centerness: bool = False
    norm: str = ""
    shared_levels_bn: bool = False
    dtype: Any = None  # activation dtype for tower norms (None = f32)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False):
        from u2seg_tpu.ops.norms import get_norm

        init = nn.initializers.normal(0.01)
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )
        cls_pred = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            padding=[(1, 1), (1, 1)], kernel_init=init, bias_init=bias_init,
            name="cls_score",
        )
        box_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=init, name="bbox_pred",
        )
        ctr_pred = (
            nn.Conv(self.num_anchors, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=init, name="centerness")
            if self.with_centerness else None
        )

        def tower(feats, prefix):
            feats = list(feats)
            for i, d in enumerate(self.conv_dims):
                conv = nn.Conv(d, (3, 3), padding=[(1, 1), (1, 1)],
                               kernel_init=init, name=f"{prefix}_conv{i}")
                feats = [conv(f) for f in feats]
                if self.norm:
                    norm_mod = get_norm(self.norm, d, dtype=self.dtype)
                    if self.shared_levels_bn:
                        from u2seg_tpu.projects.rethinking_bn import (
                            shared_levels_norm,
                        )

                        feats = shared_levels_norm(norm_mod, feats, train)
                    elif isinstance(norm_mod, nn.BatchNorm):
                        feats = [norm_mod(f, use_running_average=not train)
                                 for f in feats]
                    else:
                        feats = [norm_mod(f) for f in feats]
                feats = [nn.relu(f) for f in feats]
            return feats

        cls_feats = tower(features, "cls")
        box_feats = tower(features, "box")
        logits = [cls_pred(f) for f in cls_feats]
        boxes = [box_pred(f) for f in box_feats]
        ctr = [ctr_pred(f) for f in box_feats] if ctr_pred is not None else []
        return logits, boxes, ctr


class RetinaNet(nn.Module):
    """Anchor-based one-stage detector over FPN features (p3-p7)."""

    cfg: RetinaNetConfig
    anchor_cfg: AnchorConfig = dataclasses.field(
        default_factory=lambda: AnchorConfig(
            sizes=((32, 40, 50), (64, 80, 101), (128, 161, 203),
                   (256, 322, 406), (512, 645, 812)),
        )
    )

    def _anchors(self, feats: Dict[str, jnp.ndarray]):
        names = list(self.cfg.in_features)
        shapes = [feats[n].shape[1:3] for n in names]
        strides = [FPN_STRIDES[n] for n in names]
        return multilevel_anchors(
            shapes, strides, self.anchor_cfg.sizes,
            self.anchor_cfg.aspect_ratios, self.anchor_cfg.offset,
        )

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], image_sizes,
                 gt: Optional[GtInstances] = None, train: bool = False):
        c = self.cfg
        feats = [features[f] for f in c.in_features]
        num_anchors = len(self.anchor_cfg.aspect_ratios) * len(
            self.anchor_cfg.sizes[0]
        )
        head = DenseHead(c.num_classes, num_anchors, norm=c.head_norm,
                         shared_levels_bn=c.head_shared_bn, name="head")
        logits_l, deltas_l, _ = head(feats, train=train)
        b = feats[0].shape[0]
        logits = jnp.concatenate(
            [x.reshape(b, -1, c.num_classes) for x in logits_l], axis=1
        )
        deltas = jnp.concatenate(
            [x.reshape(b, -1, 4) for x in deltas_l], axis=1
        )
        anchors = jnp.concatenate(self._anchors(features), axis=0)

        if train:
            assert gt is not None
            return self._losses(anchors, logits, deltas, gt)
        return self._inference(anchors, logits_l, deltas_l, image_sizes)

    def _losses(self, anchors, logits, deltas, gt: GtInstances):
        c = self.cfg

        def per_image(gt_boxes, gt_classes, gt_valid, logit, delta):
            iou = box_ops.pairwise_iou(gt_boxes, anchors)
            midx, mlabel = matcher.match(
                iou, gt_valid, c.iou_thresholds, (0, -1, 1), True
            )
            fg = mlabel == 1
            valid = mlabel >= 0
            target_cls = jax.nn.one_hot(
                jnp.where(fg, gt_classes[midx], c.num_classes),
                c.num_classes + 1,
            )[:, :-1]
            cls_loss = L.sigmoid_focal_loss(
                logit, target_cls, c.focal_alpha, c.focal_gamma
            )
            cls_loss = jnp.sum(cls_loss * valid[:, None])
            tgt = box_ops.get_deltas(anchors, gt_boxes[midx], c.box_reg_weights)
            reg = L.smooth_l1(delta, tgt, c.smooth_l1_beta)
            reg_loss = jnp.sum(jnp.sum(reg, -1) * fg)
            return cls_loss, reg_loss, jnp.sum(fg)

        cls_l, reg_l, num_fg = jax.vmap(per_image)(
            gt.boxes, gt.classes, gt.valid, logits, deltas
        )
        norm = jnp.maximum(jnp.sum(num_fg), 1.0)
        return {
            "loss_cls": jnp.sum(cls_l) / norm,
            "loss_box_reg": jnp.sum(reg_l) / norm,
        }

    def _inference(self, anchors, logits_l, deltas_l, image_sizes):
        c = self.cfg
        b = logits_l[0].shape[0]

        def per_image(args):
            cand_boxes, cand_scores, cand_cls, hw = args
            cand_boxes = box_ops.clip(cand_boxes, hw)
            keep, valid = batched_nms(
                cand_boxes, cand_scores, cand_cls, c.nms_thresh,
                c.max_detections,
            )
            return (
                cand_boxes[keep], jnp.where(valid, cand_scores[keep], 0.0),
                cand_cls[keep], valid,
            )

        # per-level topk
        offset = 0
        all_boxes, all_scores, all_cls = [], [], []
        for logit, delta in zip(logits_l, deltas_l):
            n_l = logit.shape[1] * logit.shape[2] * (
                logit.shape[3] // c.num_classes
            )
            lvl_anc = anchors[offset:offset + n_l]
            offset += n_l
            flat_logit = logit.reshape(b, -1)           # (B, n_l*C)
            probs = jax.nn.sigmoid(flat_logit)
            k = min(c.topk_candidates, probs.shape[1])
            topv, topi = jax.lax.top_k(probs, k)
            anchor_idx = topi // c.num_classes
            cls_idx = (topi % c.num_classes).astype(jnp.int32)
            d = delta.reshape(b, -1, 4)
            sel_delta = jnp.take_along_axis(d, anchor_idx[..., None], axis=1)
            sel_anchor = lvl_anc[anchor_idx]
            boxes = box_ops.apply_deltas(sel_delta, sel_anchor, c.box_reg_weights)
            topv = jnp.where(topv > c.score_thresh, topv, -jnp.inf)
            all_boxes.append(boxes)
            all_scores.append(topv)
            all_cls.append(cls_idx)

        cand_boxes = jnp.concatenate(all_boxes, axis=1)
        cand_scores = jnp.concatenate(all_scores, axis=1)
        cand_cls = jnp.concatenate(all_cls, axis=1)
        db, ds, dc, dv = jax.vmap(
            lambda bx, sc, cl, hw: per_image((bx, sc, cl, hw))
        )(cand_boxes, cand_scores, cand_cls, image_sizes)
        return Detections(boxes=db, scores=ds, classes=dc, valid=dv)


class FCOS(nn.Module):
    """Anchor-free one-stage detector (ref meta_arch/fcos.py:25): per-pixel
    ltrb distance regression + centerness, center-sampling assignment."""

    cfg: FCOSConfig

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], image_sizes,
                 gt: Optional[GtInstances] = None, train: bool = False):
        c = self.cfg
        feats = [features[f] for f in c.in_features]
        strides = [FPN_STRIDES[f] for f in c.in_features]
        head = DenseHead(c.num_classes, 1, with_centerness=True,
                         norm=c.head_norm, name="head")
        logits_l, reg_l, ctr_l = head(feats, train=train)

        b = feats[0].shape[0]
        points, point_strides, ranges = [], [], []
        for f, s, rng_ in zip(feats, strides, c.size_ranges):
            h, w = f.shape[1:3]
            ys = (jnp.arange(h) + 0.5) * s
            xs = (jnp.arange(w) + 0.5) * s
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            points.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1))
            point_strides.append(jnp.full((h * w,), s, jnp.float32))
            ranges.append(
                jnp.broadcast_to(
                    jnp.asarray(rng_, jnp.float32), (h * w, 2)
                )
            )
        pts = jnp.concatenate(points)                      # (P, 2)
        pstr = jnp.concatenate(point_strides)              # (P,)
        prng = jnp.concatenate(ranges)                     # (P, 2)

        logits = jnp.concatenate(
            [x.reshape(b, -1, c.num_classes) for x in logits_l], 1
        )
        # ltrb distances predicted via exp-scaled conv output * stride
        reg = jnp.concatenate([x.reshape(b, -1, 4) for x in reg_l], 1)
        reg = jnp.exp(reg) * pstr[None, :, None]
        ctr = jnp.concatenate([x.reshape(b, -1) for x in ctr_l], 1)

        if train:
            assert gt is not None
            return self._losses(pts, pstr, prng, logits, reg, ctr, gt)
        return self._inference(pts, logits, reg, ctr, image_sizes)

    def _assign(self, pts, pstr, prng, gt_boxes, gt_valid):
        """Center-sampling assignment: point -> smallest valid gt."""
        c = self.cfg
        x, y = pts[:, 0], pts[:, 1]
        x0 = gt_boxes[:, 0][None, :]
        y0 = gt_boxes[:, 1][None, :]
        x1 = gt_boxes[:, 2][None, :]
        y1 = gt_boxes[:, 3][None, :]
        l = x[:, None] - x0
        t = y[:, None] - y0
        r = x1 - x[:, None]
        bm = y1 - y[:, None]
        ltrb = jnp.stack([l, t, r, bm], -1)                # (P, G, 4)
        inside = jnp.min(ltrb, -1) > 0
        # center sampling: point within radius*stride of gt center
        cx = (x0 + x1) / 2
        cy = (y0 + y1) / 2
        rad = c.center_sampling_radius * pstr[:, None]
        near = (jnp.abs(x[:, None] - cx) < rad) & (jnp.abs(y[:, None] - cy) < rad)
        maxd = jnp.max(ltrb, -1)
        in_range = (maxd >= prng[:, 0:1]) & (maxd <= prng[:, 1:2])
        ok = inside & near & in_range & gt_valid[None, :]
        areas = box_ops.area(gt_boxes)[None, :]
        areas = jnp.where(ok, areas, jnp.inf)
        gidx = jnp.argmin(areas, -1).astype(jnp.int32)
        fg = jnp.isfinite(jnp.min(areas, -1))
        tgt_ltrb = jnp.take_along_axis(
            ltrb, gidx[:, None, None], axis=1
        )[:, 0]
        return gidx, fg, tgt_ltrb

    def _losses(self, pts, pstr, prng, logits, reg, ctr, gt: GtInstances):
        c = self.cfg

        def per_image(gt_boxes, gt_classes, gt_valid, logit, rg, ct):
            gidx, fg, tgt = self._assign(pts, pstr, prng, gt_boxes, gt_valid)
            target_cls = jax.nn.one_hot(
                jnp.where(fg, gt_classes[gidx], c.num_classes),
                c.num_classes + 1,
            )[:, :-1]
            cls_loss = jnp.sum(L.sigmoid_focal_loss(
                logit, target_cls, c.focal_alpha, c.focal_gamma
            ))
            pred_boxes = jnp.stack([
                pts[:, 0] - rg[:, 0], pts[:, 1] - rg[:, 1],
                pts[:, 0] + rg[:, 2], pts[:, 1] + rg[:, 3],
            ], -1)
            tgt_boxes = jnp.stack([
                pts[:, 0] - tgt[:, 0], pts[:, 1] - tgt[:, 1],
                pts[:, 0] + tgt[:, 2], pts[:, 1] + tgt[:, 3],
            ], -1)
            reg_loss = jnp.sum(L.giou_loss(pred_boxes, tgt_boxes) * fg)
            # centerness target: sqrt(min(l,r)/max(l,r) * min(t,b)/max(t,b))
            lr = jnp.stack([tgt[:, 0], tgt[:, 2]], -1)
            tb = jnp.stack([tgt[:, 1], tgt[:, 3]], -1)
            ctr_tgt = jnp.sqrt(jnp.clip(
                (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6))
                * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)),
                0.0, 1.0,
            ))
            ctr_loss = jnp.sum(L.bce_with_logits(ct, ctr_tgt) * fg)
            return cls_loss, reg_loss, ctr_loss, jnp.sum(fg)

        cls_l, reg_l_, ctr_l_, num_fg = jax.vmap(per_image)(
            gt.boxes, gt.classes, gt.valid, logits, reg, ctr
        )
        norm = jnp.maximum(jnp.sum(num_fg), 1.0)
        return {
            "loss_fcos_cls": jnp.sum(cls_l) / norm,
            "loss_fcos_loc": jnp.sum(reg_l_) / norm,
            "loss_fcos_ctr": jnp.sum(ctr_l_) / norm,
        }

    def _inference(self, pts, logits, reg, ctr, image_sizes):
        c = self.cfg
        b = logits.shape[0]
        probs = jnp.sqrt(
            jax.nn.sigmoid(logits) * jax.nn.sigmoid(ctr)[..., None]
        )
        flat = probs.reshape(b, -1)
        k = min(c.topk_candidates, flat.shape[1])
        topv, topi = jax.lax.top_k(flat, k)
        pt_idx = topi // c.num_classes
        cls_idx = (topi % c.num_classes).astype(jnp.int32)
        sel_reg = jnp.take_along_axis(reg, pt_idx[..., None], axis=1)
        sel_pts = pts[pt_idx]
        boxes = jnp.stack([
            sel_pts[..., 0] - sel_reg[..., 0],
            sel_pts[..., 1] - sel_reg[..., 1],
            sel_pts[..., 0] + sel_reg[..., 2],
            sel_pts[..., 1] + sel_reg[..., 3],
        ], -1)
        scores = jnp.where(topv > c.score_thresh, topv, -jnp.inf)

        def per_image(bx, sc, cl, hw):
            bx = box_ops.clip(bx, hw)
            keep, valid = batched_nms(bx, sc, cl, c.nms_thresh, c.max_detections)
            return bx[keep], jnp.where(valid, sc[keep], 0.0), cl[keep], valid

        db, ds, dc, dv = jax.vmap(per_image)(boxes, scores, cls_idx, image_sizes)
        return Detections(boxes=db, scores=ds, classes=dc, valid=dv)


class DenseDetectorMetaArch(nn.Module):
    """Backbone + one-stage head as a full meta-architecture.

    Counterpart of the reference's RetinaNet/FCOS meta-archs
    (``meta_arch/retinanet.py:29``, ``meta_arch/fcos.py:25``), which own
    their backbone (``build_backbone``), normalization and postprocess;
    here the head modules above stay feature->detections and this wrapper
    adds the ResNet-FPN bottom-up (res3-res5 laterals + p6/p7 convs, ref
    ``Base-RetinaNet.yaml``) and pixel normalization.
    """

    cfg: Any  # ModelConfig
    head_name: str = "RetinaNet"

    def setup(self):
        import dataclasses as _dc

        from u2seg_tpu.models.backbone import build_backbone

        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        fpn_cfg = c.fpn
        if fpn_cfg.top_block != "p6p7":
            fpn_cfg = _dc.replace(
                fpn_cfg, top_block="p6p7",
                in_features=("res3", "res4", "res5"))
        self.backbone = build_backbone(
            _dc.replace(c, fpn=fpn_cfg), dtype=dtype, name="backbone")
        if self.head_name == "RetinaNet":
            self.head = RetinaNet(c.retinanet, name="head")
        else:
            self.head = FCOS(c.fcos, name="head")

    def normalize(self, images):
        mean = jnp.asarray(self.cfg.pixel_mean, images.dtype)
        std = jnp.asarray(self.cfg.pixel_std, images.dtype)
        return ((images - mean) / std).astype(
            jnp.dtype(self.cfg.compute_dtype))

    def __call__(self, images, image_sizes,
                 gt: Optional[GtInstances] = None, train: bool = False):
        features = self.backbone(self.normalize(images), train=train)
        return self.head(features, image_sizes, gt=gt, train=train)


def RetinaNetDetector(model_cfg):
    """META_ARCH_REGISTRY["RetinaNet"] builder (full model from config)."""
    return DenseDetectorMetaArch(model_cfg, head_name="RetinaNet")


def FCOSDetector(model_cfg):
    """META_ARCH_REGISTRY["FCOS"] builder (full model from config)."""
    return DenseDetectorMetaArch(model_cfg, head_name="FCOS")
