"""Full-resolution panoptic render parity tests.

The numpy renderer (engine/panoptic_render.py) must match the reference
semantics exactly; here torch (CPU) re-creates the reference ops
(grid_sample paste from mask_ops.py:17-68, F.interpolate chains from
semantic_seg.py:231 + postprocessing.py:77) as an independent oracle.
"""
from __future__ import annotations

import numpy as np
import pytest

from u2seg_tpu.engine.panoptic_render import (
    combine_panoptic_full_res,
    paste_mask_exact,
    paste_masks_full_res,
    sem_seg_probs_full_res,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _ref_paste(prob, box, img_h, img_w):
    """The reference _do_paste_mask CPU path (mask_ops.py:17-68), verbatim
    semantics in torch."""
    masks = torch.as_tensor(prob, dtype=torch.float32)[None, None]
    boxes = torch.as_tensor(box, dtype=torch.float32)[None]
    x0_int = int(max(np.floor(box[0]) - 1, 0))
    y0_int = int(max(np.floor(box[1]) - 1, 0))
    x1_int = int(min(np.ceil(box[2]) + 1, img_w))
    y1_int = int(min(np.ceil(box[3]) + 1, img_h))
    x0, y0, x1, y1 = boxes.split(1, dim=1)
    img_y = torch.arange(y0_int, y1_int, dtype=torch.float32) + 0.5
    img_x = torch.arange(x0_int, x1_int, dtype=torch.float32) + 0.5
    img_y = (img_y - y0) / (y1 - y0) * 2 - 1
    img_x = (img_x - x0) / (x1 - x0) * 2 - 1
    gx = img_x[:, None, :].expand(1, img_y.size(1), img_x.size(1))
    gy = img_y[:, :, None].expand(1, img_y.size(1), img_x.size(1))
    grid = torch.stack([gx, gy], dim=3)
    out = F.grid_sample(masks, grid, align_corners=False)[0, 0]
    canvas = np.zeros((img_h, img_w), np.float32)
    canvas[y0_int:y1_int, x0_int:x1_int] = out.numpy()
    return canvas


class TestPasteMaskExact:
    def test_matches_grid_sample_random(self):
        rng = np.random.RandomState(0)
        img_h, img_w = 97, 123
        for _ in range(25):
            prob = rng.rand(28, 28).astype(np.float32)
            x0, y0 = rng.rand(2) * 80
            w, h = rng.rand(2) * 60 + 0.5
            box = np.array([x0, y0, x0 + w, y0 + h])
            ys, xs, sub = paste_mask_exact(prob, box, img_h, img_w)
            got = np.zeros((img_h, img_w), np.float32)
            got[ys, xs] = sub
            ref = _ref_paste(prob, box, img_h, img_w)
            np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_partially_outside_image(self):
        rng = np.random.RandomState(1)
        prob = rng.rand(28, 28).astype(np.float32)
        for box in ([-10.3, -5.7, 20.2, 14.9], [80.5, 60.2, 140.0, 130.0],
                    [-20.0, -20.0, 150.0, 140.0]):
            box = np.array(box)
            ys, xs, sub = paste_mask_exact(prob, box, 100, 120)
            got = np.zeros((100, 120), np.float32)
            got[ys, xs] = sub
            ref = _ref_paste(prob, box, 100, 120)
            np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_tiny_and_degenerate_boxes(self):
        prob = np.ones((28, 28), np.float32)
        # sub-pixel box still paints >= 1 px region
        ys, xs, sub = paste_mask_exact(prob, np.array([10.4, 10.4, 10.6, 10.6]), 50, 50)
        ref = _ref_paste(prob, np.array([10.4, 10.4, 10.6, 10.6]), 50, 50)
        got = np.zeros((50, 50), np.float32)
        got[ys, xs] = sub
        np.testing.assert_allclose(got, ref, atol=2e-5)
        # degenerate (zero-size) box -> empty
        ys, xs, sub = paste_mask_exact(prob, np.array([10.0, 10.0, 10.0, 20.0]), 50, 50)
        assert sub.size == 0

    def test_threshold_semantics_ge(self):
        # reference thresholds with >= (mask_ops.py:137)
        prob = np.full((2, 2), 0.5, np.float32)
        out = paste_masks_full_res(prob[None], np.array([[0.0, 0.0, 4.0, 4.0]]), 6, 6)
        # interior samples are exactly 0.5 -> must be True under >=
        assert out[0, 1, 1]


class TestSemSegFullRes:
    def test_matches_two_stage_interpolate(self):
        rng = np.random.RandomState(2)
        h4, w4, c = 16, 24, 7
        logits = rng.randn(h4, w4, c).astype(np.float32)
        input_hw, orig_hw = (61, 93), (123, 187)
        got = sem_seg_probs_full_res(logits, input_hw, orig_hw)
        t = torch.as_tensor(logits).permute(2, 0, 1)[None]
        t = F.interpolate(t, scale_factor=4, mode="bilinear", align_corners=False)
        t = t[:, :, : input_hw[0], : input_hw[1]]
        t = F.interpolate(t, size=orig_hw, mode="bilinear", align_corners=False)
        ref = t[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4)


class TestCombineFullRes:
    def _mk_mask_prob(self, fill=1.0):
        return np.full((28, 28), fill, np.float32)

    def test_score_order_and_overlap_drop(self):
        # three instances: A (0.9) painted first, B (0.8) overlaps A by 60%
        # -> dropped, C (0.7) overlaps A by 40% -> kept but trimmed
        oh, ow = 64, 64
        probs = np.stack([self._mk_mask_prob()] * 3)
        boxes = np.array([
            [0.0, 0.0, 20.0, 20.0],     # A: 20x20 at origin
            [8.0, 0.0, 28.0, 20.0],     # B: overlaps A 12/20 = 60%
            [12.0, 0.0, 32.0, 20.0],    # C: overlaps A 8/20 = 40%
        ])
        scores = np.array([0.9, 0.8, 0.7])
        classes = np.array([5, 6, 7])
        sem = np.zeros((oh, ow), np.int64)
        pan, segs = combine_panoptic_full_res(
            probs, boxes, scores, classes, sem, stuff_area_limit=10**9
        )
        things = [s for s in segs if s["isthing"]]
        assert [s["category_id"] for s in things] == [5, 7]
        assert [s["id"] for s in things] == [1, 2]
        # C's pixels inside A stay A's
        assert pan[10, 15] == 1
        assert pan[10, 25] == 2

    def test_score_threshold_breaks(self):
        probs = np.stack([self._mk_mask_prob()] * 2)
        boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
        pan, segs = combine_panoptic_full_res(
            probs, boxes, np.array([0.6, 0.4]), np.array([1, 2]),
            np.zeros((40, 40), np.int64), instance_conf_thresh=0.5,
        )
        assert len(segs) == 1 and segs[0]["category_id"] == 1

    def test_stuff_area_limit_boundary(self):
        # label 1 has exactly 4096 unclaimed px -> kept; label 2 has 4095 -> dropped
        sem = np.zeros((128, 128), np.int64)
        sem[:32, :128] = 1                       # 4096 px
        flat = sem.reshape(-1)
        flat[32 * 128: 32 * 128 + 4095] = 2      # 4095 px
        pan, segs = combine_panoptic_full_res(
            np.zeros((0, 28, 28), np.float32), np.zeros((0, 4)),
            np.zeros((0,)), np.zeros((0,), np.int64), sem,
        )
        stuff = [s for s in segs if not s["isthing"]]
        assert [s["category_id"] for s in stuff] == [1]
        assert stuff[0]["area"] == 4096

    def test_label_zero_never_stuff(self):
        sem = np.zeros((128, 128), np.int64)  # all label 0
        pan, segs = combine_panoptic_full_res(
            np.zeros((0, 28, 28), np.float32), np.zeros((0, 4)),
            np.zeros((0,)), np.zeros((0,), np.int64), sem,
        )
        assert segs == [] and (pan == 0).all()

    def test_stuff_excludes_claimed_pixels(self):
        # stuff label covers the whole image but an instance claims half;
        # stuff area is measured on unclaimed pixels only
        oh = ow = 80
        sem = np.ones((oh, ow), np.int64)
        probs = self._mk_mask_prob()[None]
        boxes = np.array([[0.0, 0.0, 80.0, 40.0]])
        pan, segs = combine_panoptic_full_res(
            probs, boxes, np.array([0.9]), np.array([3]), sem,
            stuff_area_limit=100,
        )
        stuff = [s for s in segs if not s["isthing"]]
        assert len(stuff) == 1
        assert stuff[0]["area"] == int((pan == stuff[0]["id"]).sum())
        assert not ((pan == stuff[0]["id"]) & (pan == 1)).any()
