"""GeneralizedRCNN / ProposalNetwork / SemanticSegmentor meta-architectures.

Counterpart of ``detectron2/modeling/meta_arch/rcnn.py`` (GeneralizedRCNN
:25, ProposalNetwork :253) and ``semantic_seg.py:34`` (SemanticSegmentor).
PanopticFPN (panoptic_fpn.py) extends the same recipe with the sem-seg head
and fusion; this module provides the plain detector variants (Mask R-CNN /
Faster R-CNN are GeneralizedRCNN with/without mask head via config).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from u2seg_tpu.config.config import ModelConfig
from u2seg_tpu.models.backbone import build_backbone
from u2seg_tpu.models.roi_heads import CascadeROIHeads, StandardROIHeads
from u2seg_tpu.models.rpn import RPN
from u2seg_tpu.models.sem_seg import SemSegFPNHead
from u2seg_tpu.structures.instances import Detections, GtInstances


class GeneralizedRCNN(nn.Module):
    """backbone -> RPN -> ROI heads (ref rcnn.py:25: forward :126,
    inference :178, preprocess_image :223)."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.backbone = build_backbone(c, dtype=dtype, name="backbone")
        self.proposal_generator = RPN(c.rpn, c.anchors, dtype=dtype,
                                      name="proposal_generator")
        heads_cls = (
            CascadeROIHeads if c.roi_heads.name == "CascadeROIHeads"
            else StandardROIHeads
        )
        self.roi_heads = heads_cls(c.roi_heads, dtype=dtype, name="roi_heads")

    def normalize(self, images):
        mean = jnp.asarray(self.cfg.pixel_mean, images.dtype)
        std = jnp.asarray(self.cfg.pixel_std, images.dtype)
        return ((images - mean) / std).astype(jnp.dtype(self.cfg.compute_dtype))

    def __call__(self, images, image_sizes, gt: Optional[GtInstances] = None,
                 train: bool = False):
        x = self.normalize(images)
        features = self.backbone(x, train=train)
        rpn_out = self.proposal_generator(features, image_sizes, gt=gt, train=train)
        if train:
            roi_losses = self.roi_heads(
                features, rpn_out.proposal_boxes, rpn_out.proposal_scores,
                rpn_out.proposal_valid, image_sizes, gt=gt, train=True,
            )
            losses = dict(rpn_out.losses)
            losses.update(roi_losses)
            return losses
        return self.roi_heads(
            features, rpn_out.proposal_boxes, rpn_out.proposal_scores,
            rpn_out.proposal_valid, image_sizes, train=False,
        )


class ProposalNetwork(nn.Module):
    """Backbone + RPN only (ref rcnn.py:253): emits proposals as outputs."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.backbone = build_backbone(c, name="backbone")
        self.proposal_generator = RPN(c.rpn, c.anchors, name="proposal_generator")

    def __call__(self, images, image_sizes, gt: Optional[GtInstances] = None,
                 train: bool = False):
        mean = jnp.asarray(self.cfg.pixel_mean, images.dtype)
        std = jnp.asarray(self.cfg.pixel_std, images.dtype)
        features = self.backbone((images - mean) / std, train=train)
        out = self.proposal_generator(features, image_sizes, gt=gt, train=train)
        if train:
            return out.losses
        return Detections(
            boxes=out.proposal_boxes,
            scores=out.proposal_scores,
            classes=jnp.zeros(out.proposal_scores.shape, jnp.int32),
            valid=out.proposal_valid,
        )


class SemanticSegmentor(nn.Module):
    """Backbone + sem-seg head only (ref semantic_seg.py:34)."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.backbone = build_backbone(c, name="backbone")
        self.sem_seg_head = SemSegFPNHead(c.sem_seg_head, name="sem_seg_head")

    def __call__(self, images, image_sizes, sem_seg_gt=None, train: bool = False):
        mean = jnp.asarray(self.cfg.pixel_mean, images.dtype)
        std = jnp.asarray(self.cfg.pixel_std, images.dtype)
        features = self.backbone((images - mean) / std, train=train)
        logits, losses = self.sem_seg_head(features, sem_seg_gt, train=train)
        if train:
            return losses
        return logits
