"""Keypoint annotation pipeline: hflip indices, transform semantics,
mapper emission (ref detection_utils.py transform_keypoint_annotations
:440-490 + create_keypoint_hflip_indices :522)."""
import numpy as np

from u2seg_tpu.data import transforms as T
from u2seg_tpu.data.builtin_meta import (
    COCO_PERSON_KEYPOINT_NAMES, create_keypoint_hflip_indices,
)
from u2seg_tpu.data.mapper import transform_keypoint_annotations


def test_hflip_indices():
    idx = create_keypoint_hflip_indices()
    assert idx == [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]
    # involutive
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx[idx], np.arange(17))


def _kp(rng, w, h, n=17):
    kp = np.zeros((n, 3))
    kp[:, 0] = rng.rand(n) * w
    kp[:, 1] = rng.rand(n) * h
    kp[:, 2] = rng.choice([0, 1, 2], n)
    kp[kp[:, 2] == 0] = 0
    return kp


def test_transform_resize_and_flip():
    rng = np.random.RandomState(0)
    w, h = 100, 80
    kp = _kp(rng, w, h)
    idx = create_keypoint_hflip_indices()

    # pure resize: coords scale, labels unchanged
    tfm = T.TransformList([T.ResizeTransform(h, w, h * 2, w * 2)])
    out = transform_keypoint_annotations(
        kp.reshape(-1).tolist(), tfm, (h * 2, w * 2), idx)
    lab = kp[:, 2] > 0
    np.testing.assert_allclose(out[lab, 0], kp[lab, 0] * 2, atol=1e-6)
    np.testing.assert_array_equal(out[:, 2], kp[:, 2])

    # flip: x mirrored AND left/right identities swapped
    tfm = T.TransformList([T.HFlipTransform(w)])
    out = transform_keypoint_annotations(
        kp.reshape(-1).tolist(), tfm, (h, w), idx)
    want = kp.copy()
    want[lab, 0] = w - want[lab, 0]
    want = want[idx]
    lab_f = want[:, 2] > 0
    np.testing.assert_allclose(out[lab_f], want[lab_f], atol=1e-6)

    # double flip is identity
    tfm = T.TransformList([T.HFlipTransform(w), T.HFlipTransform(w)])
    out = transform_keypoint_annotations(
        kp.reshape(-1).tolist(), tfm, (h, w), idx)
    np.testing.assert_allclose(out[lab], kp[lab], atol=1e-6)


def test_transform_out_of_bounds_unlabeled():
    idx = create_keypoint_hflip_indices()
    kp = np.zeros((17, 3))
    kp[:, 0] = np.linspace(5, 95, 17)
    kp[:, 1] = 40.0
    kp[:, 2] = 2
    # crop keeps x in [30, 70): points outside become v=0 and zeroed
    tfm = T.TransformList([T.CropTransform(30, 0, 40, 80)])
    out = transform_keypoint_annotations(
        kp.reshape(-1).tolist(), tfm, (80, 40), idx)
    inside = (kp[:, 0] >= 30) & (kp[:, 0] <= 70)
    assert (out[~inside] == 0).all()
    np.testing.assert_allclose(out[inside, 0], kp[inside, 0] - 30, atol=1e-6)
    assert (out[inside, 2] == 2).all()


def test_mapper_emits_keypoints(tmp_path):
    import cv2

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.data.mapper import DatasetMapper

    cfg = Config()
    cfg.model.max_gt_instances = 4
    cfg.model.keypoint_on = True
    cfg.input.pad_buckets = ((128, 128),)
    cfg.input.min_size_train = (96,)
    cfg.input.max_size_train = 128

    rng = np.random.RandomState(0)
    h, w = 100, 120
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    fname = str(tmp_path / "img.jpg")
    cv2.imwrite(fname, img)
    kp = _kp(rng, 50, 60)
    kp[:, 0] += 10
    kp[:, 1] += 20
    kp[kp[:, 2] == 0] = 0
    dd = {"file_name": fname, "image_id": 0, "height": h, "width": w,
          "annotations": [{
              "bbox": [10.0, 20.0, 50.0, 60.0], "iscrowd": 0,
              "category_id": 0,
              "keypoints": kp.reshape(-1).tolist(),
              "segmentation": [[10.0, 20.0, 60.0, 20.0, 60.0, 80.0,
                                10.0, 80.0]],
          }]}
    mapper = DatasetMapper(cfg, is_train=True)
    ex = mapper(dd, np.random.RandomState(1))
    assert ex["gt_keypoints"].shape == (4, 17, 3)
    gk = ex["gt_keypoints"][0]
    lab = gk[:, 2] > 0
    assert lab.any()
    # labeled keypoints live inside the transformed GT box (pad 1px)
    x0, y0, x1, y1 = ex["gt_boxes"][0]
    assert (gk[lab, 0] >= x0 - 1).all() and (gk[lab, 0] <= x1 + 1).all()
    assert (gk[lab, 1] >= y0 - 1).all() and (gk[lab, 1] <= y1 + 1).all()
    # visibility values survive the transform
    assert set(np.unique(gk[:, 2])) <= {0.0, 1.0, 2.0}
