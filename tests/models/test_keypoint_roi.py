"""Keypoint branch of StandardROIHeads: selection, loss, inference
(ref roi_heads.py _forward_keypoint + keypoint_head.py)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from u2seg_tpu.config.config import ROIHeadsConfig
from u2seg_tpu.models.roi_heads import StandardROIHeads
from u2seg_tpu.structures.instances import GtInstances


def _cfg():
    c = ROIHeadsConfig()
    c.name = "StandardROIHeads"
    c.num_classes = 5
    c.batch_size_per_image = 16
    c.detections_per_image = 8
    c.mask_on = False
    c.keypoint_on = True
    c.keypoint_head = dataclasses.replace(
        c.keypoint_head, conv_dims=(32, 32))
    c.pooler_impl = "gather"
    return c


def _features(rng, b=2, base=32, ch=16):
    return {f"p{i+2}": jnp.asarray(
        rng.randn(b, base // 2 ** i, base * 2 // 2 ** i, ch) * 0.1,
        jnp.float32) for i in range(4)}


def _gt(rng, b=2, g=3, kp_n=17, img=(128, 256)):
    xy = rng.rand(b, g, 2) * 40
    wh = rng.rand(b, g, 2) * 60 + 30
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    kp = np.zeros((b, g, kp_n, 3), np.float32)
    kp[..., 0] = boxes[..., None, 0] + rng.rand(b, g, kp_n) * wh[..., None, 0]
    kp[..., 1] = boxes[..., None, 1] + rng.rand(b, g, kp_n) * wh[..., None, 1]
    kp[..., 2] = 2.0
    return GtInstances(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(rng.randint(0, 5, (b, g)), jnp.int32),
        valid=jnp.ones((b, g), bool),
        keypoints=jnp.asarray(kp),
    )


def test_keypoint_branch_train_and_inference():
    rng = np.random.RandomState(0)
    cfg = _cfg()
    heads = StandardROIHeads(cfg, mask_fg_capacity=8)
    feats = _features(rng)
    gt = _gt(rng)
    b, k = 2, 24
    rpn_boxes = jnp.asarray(
        np.concatenate([np.asarray(gt.boxes) + 2.0,
                        rng.rand(b, k - 3, 4) * 50], axis=1), jnp.float32)
    rpn_boxes = rpn_boxes.at[..., 2:].max(rpn_boxes[..., :2] + 4.0)
    rpn_scores = jnp.asarray(rng.rand(b, k), jnp.float32)
    rpn_valid = jnp.ones((b, k), bool)
    sizes = jnp.asarray([[128, 256]] * b, jnp.int32)

    variables = heads.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        feats, rpn_boxes, rpn_scores, rpn_valid, sizes, gt=gt, train=True,
    )
    losses = heads.apply(
        variables, feats, rpn_boxes, rpn_scores, rpn_valid, sizes,
        gt=gt, train=True, rngs={"sampling": jax.random.PRNGKey(2)},
    )
    assert "loss_keypoint" in losses
    assert np.isfinite(float(losses["loss_keypoint"]))
    assert float(losses["loss_keypoint"]) > 0.0

    det = heads.apply(
        variables, feats, rpn_boxes, rpn_scores, rpn_valid, sizes,
        train=False,
    )
    assert det.keypoints is not None
    assert det.keypoints.shape == (b, cfg.detections_per_image, 17, 4)
    assert np.isfinite(np.asarray(det.keypoints)).all()


def test_keypoint_loss_zero_when_no_visible():
    rng = np.random.RandomState(1)
    cfg = _cfg()
    heads = StandardROIHeads(cfg, mask_fg_capacity=8)
    feats = _features(rng)
    gt = _gt(rng)
    gt = dataclasses.replace(
        gt, keypoints=gt.keypoints.at[..., 2].set(0.0))
    b, k = 2, 16
    rpn_boxes = jnp.asarray(rng.rand(b, k, 4) * 40, jnp.float32)
    rpn_boxes = rpn_boxes.at[..., 2:].set(rpn_boxes[..., :2] + 30.0)
    variables = heads.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        feats, rpn_boxes, jnp.ones((b, k)), jnp.ones((b, k), bool),
        jnp.asarray([[128, 256]] * b, jnp.int32), gt=gt, train=True,
    )
    losses = heads.apply(
        variables, feats, rpn_boxes, jnp.ones((b, k)),
        jnp.ones((b, k), bool), jnp.asarray([[128, 256]] * b, jnp.int32),
        gt=gt, train=True, rngs={"sampling": jax.random.PRNGKey(2)},
    )
    assert float(losses["loss_keypoint"]) == 0.0
