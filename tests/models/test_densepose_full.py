"""DensePose data pipeline / loss geometry / evaluator tests.

Oracles: hand-built numpy for the data packing, a torch ``grid_sample``
transcription of the reference's ``resample_data`` (losses/utils.py:195)
and ``_linear_interpolation_utilities`` (:16) for the geometry, and exact
AP expectations for the IoU-mode evaluator.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from u2seg_tpu.evaluation import rle as rle_codec
from u2seg_tpu.projects.densepose import (
    DensePoseConfig, DensePosePoints, chart_point_sample,
    densepose_losses_from_raw, remap_points_to_proposals,
    resample_coarse_segm_gt, select_densepose_rois,
)
from u2seg_tpu.projects.densepose_data import (
    MASK_LABEL_SYMMETRIES, POINT_LABEL_SYMMETRIES, DensePoseRawData,
    decode_dp_masks, flip_densepose, pack_densepose_gt,
    parse_densepose_annotation,
)


def _mk_ann(n_pts=5, seed=0, with_masks=True):
    rng = np.random.RandomState(seed)
    ann = {
        "bbox": [10.0, 20.0, 40.0, 80.0],
        "dp_x": (rng.rand(n_pts) * 255).tolist(),
        "dp_y": (rng.rand(n_pts) * 255).tolist(),
        "dp_I": rng.randint(1, 25, n_pts).astype(float).tolist(),
        "dp_U": rng.rand(n_pts).tolist(),
        "dp_V": rng.rand(n_pts).tolist(),
    }
    if with_masks:
        masks = []
        for part in range(14):
            if part % 5 == 0:
                m = np.zeros((256, 256), np.uint8)
                m[part * 10:part * 10 + 40, 30:90] = 1
                masks.append(rle_codec.encode(m))
            else:
                masks.append([])
        ann["dp_masks"] = masks
    return ann


# ---------------------------------------------------------------------------
# data packing
# ---------------------------------------------------------------------------

def test_parse_and_pack():
    ann = _mk_ann()
    data = parse_densepose_annotation(ann, max_points=8)
    assert data is not None
    assert data.point_valid[:5].all() and not data.point_valid[5:].any()
    np.testing.assert_allclose(
        data.xy[:5, 0], np.asarray(ann["dp_x"], np.float32) / 256.0)
    assert set(np.unique(data.segm)) <= {0, 1, 6, 11}  # parts 0,5,10 -> +1

    packed = pack_densepose_gt([data, None, data], max_gt=4, max_points=8)
    assert packed["dp_valid"].tolist() == [True, False, True, False]
    np.testing.assert_array_equal(packed["dp_xy"][0], data.xy)
    assert packed["dp_segm"].shape == (4, 256, 256)

    assert parse_densepose_annotation({"bbox": [0, 0, 1, 1]}) is None


def test_flip_semantics():
    ann = _mk_ann()
    data = parse_densepose_annotation(ann, max_points=8)
    flipped = flip_densepose(data)
    np.testing.assert_allclose(
        flipped.xy[:5, 0], 1.0 - data.xy[:5, 0], atol=1e-6)
    np.testing.assert_array_equal(
        flipped.i[:5], POINT_LABEL_SYMMETRIES[data.i[:5]])
    np.testing.assert_array_equal(
        flipped.segm, MASK_LABEL_SYMMETRIES[data.segm[:, ::-1]])
    # double flip is identity
    back = flip_densepose(flipped)
    np.testing.assert_allclose(back.xy[:5], data.xy[:5], atol=1e-6)
    np.testing.assert_array_equal(back.i, data.i)
    np.testing.assert_array_equal(back.segm, data.segm)


# ---------------------------------------------------------------------------
# geometry vs torch oracles
# ---------------------------------------------------------------------------

def test_remap_points_identity_and_shift():
    gt_box = jnp.array([[10.0, 20.0, 50.0, 100.0]])
    xy = jnp.array([[[0.25, 0.5], [0.0, 0.0], [0.99, 0.99]]])
    c, inside = remap_points_to_proposals(xy, gt_box, gt_box)
    np.testing.assert_allclose(np.asarray(c), np.asarray(xy), atol=1e-6)
    assert inside[0].all()

    # proposal covers the right half of the GT box
    prop = jnp.array([[30.0, 20.0, 50.0, 100.0]])
    c, inside = remap_points_to_proposals(xy, gt_box, prop)
    # x=0.25 in gt -> img 20 -> left of proposal -> invalid
    assert not inside[0, 0] and not inside[0, 1] and inside[0, 2]
    np.testing.assert_allclose(float(c[0, 2, 0]), (0.99 * 40 - 20) / 20,
                               atol=1e-5)


def test_resample_coarse_segm_matches_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    sg, s = 32, 16
    segm = rng.randint(0, 15, (2, sg, sg)).astype(np.uint8)
    gt = np.array([[5.0, 8.0, 45.0, 88.0], [0.0, 0.0, 30.0, 30.0]],
                  np.float32)
    prop = np.array([[10.0, 6.0, 50.0, 70.0], [-5.0, 4.0, 28.0, 40.0]],
                    np.float32)

    got = np.asarray(resample_coarse_segm_gt(
        jnp.asarray(segm.astype(np.int32)), jnp.asarray(gt),
        jnp.asarray(prop), s, binarize=False))

    # oracle: reference resample_data with mode=nearest, zeros padding,
    # align_corners=True (losses/utils.py:195-235)
    z = torch.from_numpy(segm.astype(np.float32))[:, None]
    xywh_gt = np.stack([gt[:, 0], gt[:, 1], gt[:, 2] - gt[:, 0],
                        gt[:, 3] - gt[:, 1]], 1)
    xywh_pr = np.stack([prop[:, 0], prop[:, 1], prop[:, 2] - prop[:, 0],
                        prop[:, 3] - prop[:, 1]], 1)
    x0s, y0s, ws, hs = torch.from_numpy(xywh_gt).unbind(1)
    x0d, y0d, wd, hd = torch.from_numpy(xywh_pr).unbind(1)
    x0n, y0n = 2 * (x0d - x0s) / ws - 1, 2 * (y0d - y0s) / hs - 1
    x1n, y1n = 2 * (x0d + wd - x0s) / ws - 1, 2 * (y0d + hd - y0s) / hs - 1
    gw = torch.arange(s, dtype=torch.float32) / s
    gx = gw[None, None, :] * (x1n - x0n)[:, None, None] + x0n[:, None, None]
    gy = gw[None, :, None] * (y1n - y0n)[:, None, None] + y0n[:, None, None]
    grid = torch.stack([gx.expand(2, s, s), gy.expand(2, s, s)], dim=3)
    want = F.grid_sample(z, grid, mode="nearest", padding_mode="zeros",
                         align_corners=True)[:, 0].numpy().astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_chart_point_sample_matches_reference_interp():
    rng = np.random.RandomState(0)
    s, c, p = 8, 3, 64
    maps = rng.randn(2, s, s, c).astype(np.float32)
    pts = rng.rand(2, p, 2).astype(np.float32)
    got = np.asarray(chart_point_sample(jnp.asarray(maps), jnp.asarray(pts)))

    # numpy transcription of _linear_interpolation_utilities (:16-60)
    def oracle(m, xy):
        vg_x, vg_y = xy[:, 0] * s, xy[:, 1] * s
        xlo = np.clip(np.floor(vg_x).astype(int), 0, s - 1)
        xhi = np.minimum(xlo + 1, s - 1)
        vg_x = np.minimum(xhi.astype(np.float32), vg_x)
        xw = vg_x - xlo
        ylo = np.clip(np.floor(vg_y).astype(int), 0, s - 1)
        yhi = np.minimum(ylo + 1, s - 1)
        vg_y = np.minimum(yhi.astype(np.float32), vg_y)
        yw = vg_y - ylo
        out = np.zeros((p, c), np.float32)
        for k in range(p):
            top = m[ylo[k], xlo[k]] + (m[ylo[k], xhi[k]] - m[ylo[k], xlo[k]]) * xw[k]
            bot = m[yhi[k], xlo[k]] + (m[yhi[k], xhi[k]] - m[yhi[k], xlo[k]]) * xw[k]
            out[k] = top + (bot - top) * yw[k]
        return out

    want = np.stack([oracle(maps[i], pts[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# loss assembly + ROI selection
# ---------------------------------------------------------------------------

def test_losses_from_raw_finite_and_masked():
    rng = np.random.RandomState(1)
    cfg = DensePoseConfig()
    r, s, p, sg = 4, 16, 8, 32
    outputs = {
        "coarse_segm": jnp.asarray(rng.randn(r, s, s, 2), jnp.float32),
        "fine_segm": jnp.asarray(rng.randn(r, s, s, 25), jnp.float32),
        "u": jnp.asarray(rng.rand(r, s, s, 25), jnp.float32),
        "v": jnp.asarray(rng.rand(r, s, s, 25), jnp.float32),
    }
    gt_boxes = jnp.asarray(
        np.tile([[4.0, 4.0, 60.0, 90.0]], (r, 1)), jnp.float32)
    roi_boxes = gt_boxes + 2.0
    losses = densepose_losses_from_raw(
        outputs, roi_boxes, jnp.ones(r, bool), gt_boxes,
        jnp.asarray(rng.rand(r, p, 2), jnp.float32),
        jnp.asarray(rng.randint(1, 25, (r, p)), jnp.int32),
        jnp.asarray(rng.rand(r, p), jnp.float32),
        jnp.asarray(rng.rand(r, p), jnp.float32),
        jnp.ones((r, p), bool),
        jnp.asarray(rng.randint(0, 15, (r, sg, sg)), jnp.int32),
        cfg,
    )
    for v in losses.values():
        assert np.isfinite(float(v))

    # all ROIs invalid -> every loss is exactly 0
    dead = densepose_losses_from_raw(
        outputs, roi_boxes, jnp.zeros(r, bool), gt_boxes,
        jnp.asarray(rng.rand(r, p, 2), jnp.float32),
        jnp.asarray(rng.randint(1, 25, (r, p)), jnp.int32),
        jnp.asarray(rng.rand(r, p), jnp.float32),
        jnp.asarray(rng.rand(r, p), jnp.float32),
        jnp.ones((r, p), bool),
        jnp.asarray(rng.randint(0, 15, (r, sg, sg)), jnp.int32),
        cfg,
    )
    for v in dead.values():
        assert float(v) == 0.0


def test_select_densepose_rois():
    is_fg = jnp.asarray([[True, True, False, True]])
    gt_idx = jnp.asarray([[0, 1, 0, 2]])
    dp_valid = jnp.asarray([[True, False, True]])
    idx, live = select_densepose_rois(is_fg, gt_idx, dp_valid, capacity=3)
    # wanted: slot 0 (gt0 has dp), slot 3 (gt2 has dp); slot 1 matched to
    # gt1 which has no dp; slot 2 is bg
    assert sorted(np.asarray(idx[0])[np.asarray(live[0])].tolist()) == [0, 3]
    assert int(np.sum(live)) == 2


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

def _synthetic_dataset(n_images=2):
    dicts = []
    for i in range(n_images):
        anns = []
        for k in range(2):
            m = np.zeros((256, 256), np.uint8)
            m[40:200, 60:220] = 1
            anns.append({
                "bbox": [20.0 + 60 * k, 30.0, 50.0, 70.0],
                "iscrowd": 0,
                "dp_masks": [rle_codec.encode(m)] + [[]] * 13,
                "dp_x": [128.0], "dp_y": [128.0], "dp_I": [1.0],
                "dp_U": [0.5], "dp_V": [0.5],
            })
        dicts.append({"image_id": 100 + i, "height": 160, "width": 240,
                      "annotations": anns})
    return dicts


def _predictions_from_gt(d, s=16, jitter=0.0):
    """Perfect (or jittered) predictions: fg = the GT dp mask."""
    from scipy.ndimage import zoom as spzoom

    boxes, scores, coarse, fine, uu, vv = [], [], [], [], [], []
    for a in d["annotations"]:
        x, y, w, h = a["bbox"]
        boxes.append([x + jitter * w, y + jitter * h,
                      x + w + jitter * w, y + h + jitter * h])
        scores.append(0.9)
        mask = np.minimum(decode_dp_masks(a["dp_masks"]), 1)
        small = spzoom(mask.astype(np.float32), (s / 256, s / 256),
                       order=1, prefilter=False) > 0.5
        cs = np.zeros((s, s, 2), np.float32)
        cs[..., 1] = np.where(small, 5.0, -5.0)
        cs[..., 0] = -cs[..., 1]
        coarse.append(cs)
        f = np.zeros((s, s, 25), np.float32)
        f[..., 1] = 5.0
        fine.append(f)
        uu.append(np.full((s, s, 25), 0.5, np.float32))
        vv.append(np.full((s, s, 25), 0.5, np.float32))
    return {
        "boxes": np.array(boxes), "scores": np.array(scores),
        "valid": np.ones(len(boxes), bool),
        "coarse_segm": np.array(coarse), "fine_segm": np.array(fine),
        "u": np.array(uu), "v": np.array(vv),
    }


def test_densepose_evaluator_perfect_and_jittered():
    from u2seg_tpu.projects.densepose_eval import DensePoseCOCOEvaluator

    dicts = _synthetic_dataset()
    ev = DensePoseCOCOEvaluator(dicts)
    for d in dicts:
        ev.process([{"image_id": d["image_id"]}],
                   [_predictions_from_gt(d, s=64)])
    res = ev.evaluate()["densepose"]
    # AP50/AP75 must be perfect; the strict-IoU thresholds lose a little
    # to boundary quantization of the coarse grid, as in the reference
    assert res["AP50"] == 100.0 and res["AP75"] == 100.0, res
    assert res["AP"] > 80.0, res

    ev2 = DensePoseCOCOEvaluator(dicts)
    for d in dicts:
        ev2.process([{"image_id": d["image_id"]}],
                    [_predictions_from_gt(d, jitter=0.4)])
    res2 = ev2.evaluate()["densepose"]
    assert res2["AP"] < res["AP"]


def test_densepose_heads_e2e():
    """DensePoseHeads over synthetic FPN features: select fg ROIs, gather
    GT, train losses differentiable + inference shapes."""
    import jax

    from u2seg_tpu.projects.densepose import (
        DensePoseHeads, gather_densepose_gt_for_rois,
    )

    rng = np.random.RandomState(0)
    cfg = DensePoseConfig(num_stacked_convs=2, conv_head_dim=32)
    b, g, p, sg, cap = 2, 3, 6, 32, 4
    feats = {f"p{i+2}": jnp.asarray(
        rng.randn(b, 64 // 2 ** i, 64 // 2 ** i, 16), jnp.float32)
        for i in range(4)}
    gt_boxes = jnp.asarray(rng.rand(b, g, 4) * 60, jnp.float32)
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 40.0)
    gt = {
        "dp_xy": jnp.asarray(rng.rand(b, g, p, 2), jnp.float32),
        "dp_i": jnp.asarray(rng.randint(1, 25, (b, g, p)), jnp.int32),
        "dp_u": jnp.asarray(rng.rand(b, g, p), jnp.float32),
        "dp_v": jnp.asarray(rng.rand(b, g, p), jnp.float32),
        "dp_point_valid": jnp.ones((b, g, p), bool),
        "dp_segm": jnp.asarray(rng.randint(0, 15, (b, g, sg, sg)),
                               jnp.uint8),
        "dp_valid": jnp.asarray([[True, True, False],
                                 [True, False, False]]),
    }
    # proposals: one per gt + one bg
    s = 6
    prop = jnp.concatenate([gt_boxes + 1.0,
                            jnp.tile(jnp.asarray([[0., 0., 8., 8.]]),
                                     (b, s - g, 1))], axis=1)
    is_fg = jnp.asarray([[1, 1, 1, 0, 0, 0]] * b, bool)
    gt_idx = jnp.tile(jnp.asarray([0, 1, 2, 0, 0, 0], jnp.int32), (b, 1))

    idx, live = select_densepose_rois(is_fg, gt_idx, gt["dp_valid"], cap)
    rboxes = jnp.take_along_axis(prop, idx[..., None], axis=1)
    ridx = jnp.take_along_axis(gt_idx, idx, axis=1)
    roi_gt = gather_densepose_gt_for_rois(gt, gt_boxes, ridx)

    heads = DensePoseHeads(cfg)
    params = heads.init(jax.random.PRNGKey(0), feats, rboxes, train=True,
                        gt=roi_gt, roi_live=live)

    def loss_fn(pr):
        losses = heads.apply(pr, feats, rboxes, train=True, gt=roi_gt,
                             roi_live=live)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params)
    assert np.isfinite(float(total))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0)
    assert gnorm > 0.0

    out = heads.apply(params, feats, rboxes, train=False)
    ssz = cfg.up_scale * 2 * 28
    assert out["coarse_segm"].shape == (b, cap, ssz, ssz, 2)
    assert out["fine_segm"].shape == (b, cap, ssz, ssz, 25)


def test_densepose_mapper_alignment_and_flip(tmp_path):
    """The mapper must keep dp arrays aligned with GT slots and apply the
    flip to box-relative points exactly when the image transform flips."""
    import cv2

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.projects.densepose_data import DensePoseDatasetMapper

    cfg = Config()
    cfg.model.max_gt_instances = 8
    cfg.input.pad_buckets = ((128, 128),)
    cfg.input.min_size_train = (96,)
    cfg.input.max_size_train = 128

    h, w = 100, 120
    img = (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)
    fname = str(tmp_path / "img.jpg")
    cv2.imwrite(fname, img)
    ann = _mk_ann(n_pts=4, seed=3)
    ann.update(iscrowd=0, category_id=0, segmentation=[[
        10.0, 20.0, 50.0, 20.0, 50.0, 100.0, 10.0, 100.0]])
    dd = {"file_name": fname, "image_id": 0, "height": h, "width": w,
          "annotations": [ann, {  # second ann WITHOUT densepose
              "bbox": [60.0, 10.0, 30.0, 40.0], "iscrowd": 0,
              "category_id": 0, "segmentation": [[
                  60.0, 10.0, 90.0, 10.0, 90.0, 50.0, 60.0, 50.0]]}]}

    mapper = DensePoseDatasetMapper(cfg, is_train=True, segm_size=64)
    saw_flip, saw_noflip = False, False
    x_orig = np.asarray(ann["dp_x"], np.float32) / 256.0
    for seed in range(8):
        ex = mapper(dd, np.random.RandomState(seed))
        assert ex is not None
        assert ex["dp_valid"].tolist()[:2] == [True, False]
        assert ex["dp_segm"].shape == (8, 64, 64)
        got_x = ex["dp_xy"][0, :4, 0]
        if np.allclose(got_x, x_orig, atol=1e-5):
            saw_noflip = True
            # unflipped: the transformed box preserves orientation
            np.testing.assert_array_equal(ex["dp_i"][0, :4],
                                          np.asarray(ann["dp_I"], int))
        elif np.allclose(got_x, 1.0 - x_orig, atol=1e-5):
            saw_flip = True
            np.testing.assert_array_equal(
                ex["dp_i"][0, :4],
                POINT_LABEL_SYMMETRIES[np.asarray(ann["dp_I"], int)])
        else:
            raise AssertionError(f"dp_x is neither original nor flipped: "
                                 f"{got_x} vs {x_orig}")
    assert saw_flip and saw_noflip


def test_quantize_chart_result_shapes():
    from u2seg_tpu.projects.densepose_eval import quantize_chart_result

    rng = np.random.RandomState(0)
    q = quantize_chart_result(
        rng.randn(8, 8, 2).astype(np.float32),
        rng.randn(8, 8, 25).astype(np.float32),
        rng.rand(8, 8, 25).astype(np.float32),
        rng.rand(8, 8, 25).astype(np.float32),
        (23, 37),
    )
    assert q.shape == (3, 37, 23) and q.dtype == np.uint8
    # U/V are zeroed outside the predicted foreground
    assert (q[1][q[0] == 0] == 0).all() and (q[2][q[0] == 0] == 0).all()
