"""Region Proposal Network (Flax, static shapes).

Counterpart of ``detectron2/modeling/proposal_generator/rpn.py``
(StandardRPNHead :67, RPN :181: label_and_sample_anchors :307, losses :366,
forward :431, predict_proposals :482) and ``proposal_utils.py``
(find_top_rpn_proposals).

TPU design: every stage has fixed capacity — per-level pre-NMS top-k,
per-level NMS (vmapped across levels & images so serial suppression depth is
paid once), cross-level post-NMS top-k — with validity masks instead of
variable lengths.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.config.config import AnchorConfig, RPNConfig
from u2seg_tpu.models import matcher, sampling
from u2seg_tpu.models.anchors import multilevel_anchors
from u2seg_tpu.models.fpn import FPN_STRIDES
from u2seg_tpu.ops import losses as L
from u2seg_tpu.ops.nms import nms
from u2seg_tpu.structures import boxes as box_ops
from u2seg_tpu.structures.instances import GtInstances


class RPNHead(nn.Module):
    """Shared 3x3 conv -> (objectness, anchor deltas) 1x1s (ref rpn.py:67)."""

    num_anchors: int
    conv_dims: Tuple[int, ...] = (-1,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        init = nn.initializers.normal(0.01)
        logits, deltas = [], []
        # build shared convs once; apply to each level
        convs = []
        for i, dim in enumerate(self.conv_dims):
            out_dim = features[0].shape[-1] if dim == -1 else dim
            convs.append(
                nn.Conv(out_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=init, dtype=self.dtype, name=f"conv{i}")
            )
        obj = nn.Conv(self.num_anchors, (1, 1), kernel_init=init,
                      dtype=self.dtype, name="objectness_logits")
        anc = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=init,
                      dtype=self.dtype, name="anchor_deltas")
        for x in features:
            t = x
            for conv in convs:
                t = nn.relu(conv(t))
            logits.append(obj(t))
            deltas.append(anc(t))
        return logits, deltas


@dataclasses.dataclass
class RPNOutput:
    proposal_boxes: jnp.ndarray   # (B, K, 4)
    proposal_scores: jnp.ndarray  # (B, K) — -inf for invalid
    proposal_valid: jnp.ndarray   # (B, K) bool
    losses: Dict[str, jnp.ndarray]


class RPN(nn.Module):
    """Full RPN over FPN features."""

    cfg: RPNConfig
    anchor_cfg: AnchorConfig
    dtype: Any = jnp.float32

    def _anchors(self, feats: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        names = list(self.cfg.in_features)
        shapes = [feats[n].shape[1:3] for n in names]
        strides = [FPN_STRIDES[n] for n in names]
        return multilevel_anchors(
            shapes, strides, self.anchor_cfg.sizes, self.anchor_cfg.aspect_ratios,
            self.anchor_cfg.offset,
        )

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        image_sizes: jnp.ndarray,                    # (B, 2) = (h, w)
        gt: Optional[GtInstances] = None,            # batched, for training
        train: bool = False,
    ) -> RPNOutput:
        c = self.cfg
        feats = [features[f] for f in c.in_features]
        num_anchors = len(self.anchor_cfg.aspect_ratios)
        head = RPNHead(num_anchors, dtype=self.dtype, name="head")
        logits_hwc, deltas_hwc = head(feats)

        b = feats[0].shape[0]
        # flatten per level: (B, H*W*A) / (B, H*W*A, 4); NHWC + inner-A order
        # matches anchor enumeration in anchors.grid_anchors. Keep the head
        # dtype here: materializing all ~200k anchors' deltas in f32 costs
        # ~1.4 ms/batch of pure layout copies; losses cast at use, and
        # proposal decoding casts only the top-k selected entries.
        logits = [l.reshape(b, -1) for l in logits_hwc]
        deltas = [d.reshape(b, -1, 4) for d in deltas_hwc]
        anchors = self._anchors(features)            # list of (N_l, 4)

        losses: Dict[str, jnp.ndarray] = {}
        if train and gt is not None:
            losses = self._losses(anchors, logits, deltas, gt, image_sizes)

        topk = c.pre_nms_topk_train if train else c.pre_nms_topk_test
        post = c.post_nms_topk_train if train else c.post_nms_topk_test
        boxes, scores, valid = self._predict_proposals(
            anchors, logits, deltas, image_sizes, topk, post
        )
        if train:
            # proposal boxes feed ROI sampling only — block gradients
            boxes = jax.lax.stop_gradient(boxes)
            scores = jax.lax.stop_gradient(scores)
        return RPNOutput(boxes, scores, valid, losses)

    # ------------------------------------------------------------------
    # Training targets & losses (ref rpn.py:307-430)
    # ------------------------------------------------------------------
    def _losses(self, anchors, logits, deltas, gt: GtInstances, image_sizes):
        c = self.cfg
        all_anchors = jnp.concatenate(anchors, axis=0)        # (N, 4)
        # losses run in f32 regardless of the compute dtype
        all_logits = jnp.concatenate(logits, axis=1).astype(jnp.float32)
        all_deltas = jnp.concatenate(deltas, axis=1).astype(jnp.float32)
        b = all_logits.shape[0]
        rng = self.make_rng("sampling")
        rngs = jax.random.split(rng, b)

        def per_image(rng_i, gt_boxes, gt_valid, logit, delta):
            iou = box_ops.pairwise_iou(gt_boxes, all_anchors)  # (G, N)
            midx, mlabel = matcher.match(
                iou, gt_valid, c.iou_thresholds, (0, -1, 1),
                allow_low_quality_matches=True,
            )
            sidx, svalid, spos = sampling.subsample_labels(
                rng_i, mlabel, c.batch_size_per_image, c.positive_fraction
            )
            # objectness: BCE over sampled anchors (pos=1, neg=0)
            s_logit = logit[sidx]
            obj_loss = L.bce_with_logits(s_logit, spos.astype(s_logit.dtype))
            obj_loss = jnp.sum(obj_loss * svalid)
            # box reg: smooth-l1 on positive samples against matched gt
            tgt = box_ops.get_deltas(
                all_anchors[sidx], gt_boxes[midx[sidx]], c.bbox_reg_weights
            )
            reg = L.smooth_l1(delta[sidx], tgt, c.smooth_l1_beta)
            reg_loss = jnp.sum(jnp.sum(reg, -1) * spos)
            return obj_loss, reg_loss

        obj_loss, reg_loss = jax.vmap(per_image)(
            rngs, gt.boxes, gt.valid, all_logits, all_deltas
        )
        normalizer = c.batch_size_per_image * b
        return {
            "loss_rpn_cls": c.loss_weight * jnp.sum(obj_loss) / normalizer,
            "loss_rpn_loc": c.loss_weight * jnp.sum(reg_loss) / normalizer,
        }

    # ------------------------------------------------------------------
    # Proposal selection (ref proposal_utils.find_top_rpn_proposals)
    # ------------------------------------------------------------------
    def _predict_proposals(self, anchors, logits, deltas, image_sizes, topk, post):
        c = self.cfg
        b = logits[0].shape[0]

        kmax = max(min(topk, anc.shape[0]) for anc in anchors)
        lvl_boxes, lvl_scores = [], []
        for anc, logit, delta in zip(anchors, logits, deltas):
            n_l = anc.shape[0]
            k = min(topk, n_l)
            # pre-NMS ranking: approx_max_k on the big fine levels (P2 has
            # ~200k anchors; exact top_k there costs ~ms while a 1% recall
            # miss only swaps candidates far below the NMS cut)
            if n_l > 4 * k:
                score, idx = jax.lax.approx_max_k(logit, k, recall_target=0.99)
            else:
                score, idx = jax.lax.top_k(logit, k)              # (B, k)
            sel_delta = jnp.take_along_axis(delta, idx[..., None], axis=1)
            sel_anc = anc[idx]                                    # (B, k, 4)
            box = box_ops.apply_deltas(sel_delta, sel_anc, c.bbox_reg_weights)
            if k < kmax:
                box = jnp.pad(box, ((0, 0), (0, kmax - k), (0, 0)))
                score = jnp.pad(score, ((0, 0), (0, kmax - k)),
                                constant_values=-jnp.inf)
            lvl_boxes.append(box)
            lvl_scores.append(score)

        # one NMS over the (level, image) grid: boxes of different levels
        # never suppress each other (ref proposal_utils batched_nms on level
        # ids), so stacking levels into the vmap batch pays the serial
        # suppression depth once instead of once per level
        nlvl = len(lvl_boxes)
        cap = min(post, kmax)
        stk_b = jnp.stack(lvl_boxes)                  # (L, B, kmax, 4)
        stk_s = jnp.stack(lvl_scores)                 # (L, B, kmax)
        hw_l = jnp.broadcast_to(image_sizes, (nlvl,) + image_sizes.shape)

        def sel_one(box, score, hw):
            box = box_ops.clip(box, hw)
            ok = box_ops.nonempty(box, threshold=c.min_size)
            score = jnp.where(ok, score, -jnp.inf)
            kidx, kvalid = nms(box, score, c.nms_thresh, cap)
            return (jnp.where(kvalid[:, None], box[kidx], 0.0),
                    jnp.where(kvalid, score[kidx], -jnp.inf))

        kept_b, kept_s = jax.vmap(jax.vmap(sel_one))(stk_b, stk_s, hw_l)
        all_b = kept_b.transpose(1, 0, 2, 3).reshape(b, nlvl * cap, 4)
        all_s = kept_s.transpose(1, 0, 2).reshape(b, nlvl * cap)
        fs, fi = jax.lax.top_k(all_s, post)
        boxes = jnp.take_along_axis(all_b, fi[..., None], axis=1)
        # downstream consumers (sampling, cascade) expect f32 scores; the
        # selection above ran in the head dtype
        scores = fs.astype(jnp.float32)
        valid = scores > -jnp.inf
        boxes = jnp.where(valid[..., None], boxes, 0.0)
        return boxes, scores, valid
