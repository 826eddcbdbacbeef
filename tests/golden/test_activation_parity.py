"""Full-model activation parity against the reference modules.

``fixtures/d2_activations.npz`` holds per-module forward outputs of the
REAL reference torch modules (R50 SyncBN stem/stages, FPN, RPN head,
3-stage cascade box heads + predictors, 800-class mask head, SemSegFPNHead)
run on deterministic inputs by ``dev/make_d2_state_dict.py`` — the same
generator run that produced the (regenerable) d2 state dict. Here the
state dict is converted with ``convert_d2_panoptic_fpn`` and each of our
Flax modules is applied to the SAME inputs; outputs must match to
f32-accumulation tolerance. A value bug anywhere in the converter, the
backbone, or the heads fails here (the reference's own pattern:
``detectron2/utils/testing.py:95`` assert_instances_allclose and the
``quick_schedules/*_inference_acc_test.yaml`` pinned-metric configs,
reduced to module granularity so failures localize).

Inputs from torch are NCHW; ours NHWC — transposed at the boundary.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 300MB state-dict convert + several compiles

ACT = os.path.join(os.path.dirname(__file__), "fixtures", "d2_activations.npz")
LEVELS = ("p2", "p3", "p4", "p5", "p6")


def nhwc(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 2, 3, 1))


def assert_close(got, want_nchw, name, rtol=1e-4):
    got = np.asarray(got)
    want = nhwc(want_nchw) if want_nchw.ndim == 4 else want_nchw
    assert got.shape == want.shape, (name, got.shape, want.shape)
    atol = 1e-4 * max(float(np.abs(want).max()), 1.0)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                               err_msg=name)


@pytest.fixture(scope="module")
def env(d2_state_path):
    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.checkpoint import convert_d2_panoptic_fpn

    ref = dict(np.load(d2_state_path))
    params, stats = convert_d2_panoptic_fpn(ref, num_stages=3)
    acts = dict(np.load(ACT))
    return Config(), params, stats, acts


def test_backbone_stages_match(env):
    from u2seg_tpu.models.resnet import ResNet

    cfg, params, stats, acts = env
    model = ResNet(cfg.model.resnet, dtype=jnp.float32)
    res = model.apply(
        {"params": params["backbone"]["bottom_up"],
         "batch_stats": stats["backbone"]["bottom_up"]},
        jnp.asarray(nhwc(acts["input_image"])), train=False,
    )
    for k in ("res2", "res3", "res4", "res5"):
        assert_close(res[k], acts[f"backbone.{k}"], k)


def test_fpn_pyramid_matches(env):
    from u2seg_tpu.models.fpn import FPN

    cfg, params, stats, acts = env
    bottom_up = {k: jnp.asarray(nhwc(acts[f"backbone.{k}"]))
                 for k in ("res2", "res3", "res4", "res5")}
    model = FPN(cfg.model.fpn, dtype=jnp.float32)
    fp = model.apply(
        {"params": params["backbone"]["fpn"],
         "batch_stats": stats["backbone"]["fpn"]},
        bottom_up, train=False,
    )
    for k in LEVELS:
        assert_close(fp[k], acts[f"fpn.{k}"], k)


def test_rpn_head_matches(env):
    from u2seg_tpu.models.rpn import RPNHead

    cfg, params, _, acts = env
    feats = [jnp.asarray(nhwc(acts[f"fpn.{k}"])) for k in LEVELS]
    head = RPNHead(num_anchors=3, dtype=jnp.float32)
    logits, deltas = head.apply(
        {"params": params["proposal_generator"]["head"]}, feats)
    for k, lg, dl in zip(LEVELS, logits, deltas):
        assert_close(lg, acts[f"rpn.logits.{k}"], f"rpn.logits.{k}")
        assert_close(dl, acts[f"rpn.deltas.{k}"], f"rpn.deltas.{k}")


def test_cascade_box_heads_match(env):
    from u2seg_tpu.models.roi_heads import (
        FastRCNNConvFCHead, FastRCNNOutputLayers,
    )

    cfg, params, _, acts = env
    rc = cfg.model.roi_heads
    pooled = jnp.asarray(nhwc(acts["pooled7"]))
    for k in range(3):
        head = FastRCNNConvFCHead(
            num_conv=rc.box_head.num_conv, conv_dim=rc.box_head.conv_dim,
            num_fc=rc.box_head.num_fc, fc_dim=rc.box_head.fc_dim,
            norm=rc.box_head.norm, dtype=jnp.float32,
        )
        feat = head.apply(
            {"params": params["roi_heads"][f"box_head{k}"]}, pooled)
        assert_close(feat, acts[f"box_head.{k}"], f"box_head.{k}")
        pred = FastRCNNOutputLayers(
            num_classes=rc.num_classes,
            cls_agnostic_bbox_reg=rc.cls_agnostic_bbox_reg,
            dtype=jnp.float32,
        )
        scores, deltas = pred.apply(
            {"params": params["roi_heads"][f"box_predictor{k}"]},
            jnp.asarray(acts[f"box_head.{k}"]),  # isolate predictor errors
        )
        assert_close(scores, acts[f"box_scores.{k}"], f"box_scores.{k}")
        assert_close(deltas, acts[f"box_deltas.{k}"], f"box_deltas.{k}")


def test_mask_head_selected_class_matches(env):
    from u2seg_tpu.models.roi_heads import MaskRCNNConvUpsampleHead

    cfg, params, _, acts = env
    rc = cfg.model.roi_heads
    head = MaskRCNNConvUpsampleHead(
        num_classes=rc.num_classes, num_conv=rc.mask_head.num_conv,
        conv_dim=rc.mask_head.conv_dim, norm=rc.mask_head.norm,
        dtype=jnp.float32,
    )
    out = head.apply(
        {"params": params["roi_heads"]["mask_head"]},
        jnp.asarray(nhwc(acts["pooled14"])),
        class_idx=jnp.asarray(acts["mask_class_idx"]),
    )
    assert_close(out[..., 0], acts["mask_logits_selected"], "mask_logits")


def test_sem_seg_head_matches(env):
    from u2seg_tpu.models.sem_seg import SemSegFPNHead

    cfg, params, _, acts = env
    feats = {k: jnp.asarray(nhwc(acts[f"fpn.{k}"]))
             for k in ("p2", "p3", "p4", "p5")}
    head = SemSegFPNHead(cfg.model.sem_seg_head, dtype=jnp.float32)
    logits, _ = head.apply({"params": params["sem_seg_head"]}, feats)
    assert_close(logits, acts["sem_logits_s4"], "sem_logits_s4")
