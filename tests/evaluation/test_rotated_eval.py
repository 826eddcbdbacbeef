"""RotatedCOCOeval / RotatedCOCOEvaluator tests."""
import numpy as np

from u2seg_tpu.evaluation.coco_api import COCO
from u2seg_tpu.evaluation.rotated_coco_evaluator import (
    RotatedCOCOEvaluator, rotated_iou_numpy,
)


def test_rotated_iou_numpy_known_values():
    a = np.array([[10.0, 10.0, 4.0, 4.0, 0.0]])
    # identical box rotated 90 deg: square is invariant -> IoU 1
    b = np.array([
        [10.0, 10.0, 4.0, 4.0, 90.0],
        [10.0, 10.0, 4.0, 4.0, 45.0],   # diamond in square
        [14.0, 10.0, 4.0, 4.0, 0.0],    # touching -> 0
        [12.0, 10.0, 4.0, 4.0, 0.0],    # half overlap -> 1/3
    ])
    iou = rotated_iou_numpy(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    # square ∩ 45°-rotated square of equal size: inter = 2(√2−1)·s²... for
    # unit squares IoU = 2(√2−1)/(2−(2(√2−1))) — match device-side constant
    expected_45 = (2 * (np.sqrt(2) - 1)) / (2 - 2 * (np.sqrt(2) - 1))
    np.testing.assert_allclose(iou[0, 1], expected_45, atol=1e-6)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 3], 1.0 / 3.0, atol=1e-6)


def test_rotated_iou_matches_device_impl():
    import jax.numpy as jnp

    from u2seg_tpu.structures.rotated_boxes import pairwise_iou_rotated

    rng = np.random.RandomState(0)
    a = np.stack([
        rng.uniform(20, 40, 6), rng.uniform(20, 40, 6),
        rng.uniform(5, 15, 6), rng.uniform(5, 15, 6),
        rng.uniform(-180, 180, 6),
    ], 1)
    b = np.stack([
        rng.uniform(20, 40, 5), rng.uniform(20, 40, 5),
        rng.uniform(5, 15, 5), rng.uniform(5, 15, 5),
        rng.uniform(-180, 180, 5),
    ], 1)
    host = rotated_iou_numpy(a, b)
    dev = np.asarray(pairwise_iou_rotated(jnp.array(a, jnp.float32),
                                          jnp.array(b, jnp.float32)))
    np.testing.assert_allclose(host, dev, atol=1e-4)


def _rotated_gt():
    return COCO({
        "images": [{"id": 1, "height": 100, "width": 100}],
        "categories": [{"id": 1, "name": "thing"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [30.0, 30.0, 20.0, 10.0, 30.0], "area": 200.0},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [70.0, 60.0, 16.0, 8.0, -45.0], "area": 128.0},
        ],
    })


def test_rotated_evaluator_perfect_predictions_ap100():
    ev = RotatedCOCOEvaluator(_rotated_gt(), mode="supervised")
    ev.process(
        [{"image_id": 1}],
        [{"instances": {
            "boxes": np.array([[30.0, 30.0, 20.0, 10.0, 30.0],
                               [70.0, 60.0, 16.0, 8.0, -45.0]]),
            "scores": np.array([0.95, 0.9]),
            "classes": np.array([1, 1]),
        }}],
    )
    res = ev.evaluate()
    assert abs(res["bbox"]["AP"] - 100.0) < 1e-6


def test_rotated_evaluator_wrong_angle_low_ap():
    ev = RotatedCOCOEvaluator(_rotated_gt(), mode="supervised")
    ev.process(
        [{"image_id": 1}],
        [{"instances": {
            # 90-deg-off elongated boxes overlap the GT poorly
            "boxes": np.array([[30.0, 30.0, 20.0, 10.0, 120.0],
                               [70.0, 60.0, 16.0, 8.0, 45.0]]),
            "scores": np.array([0.95, 0.9]),
            "classes": np.array([1, 1]),
        }}],
    )
    res = ev.evaluate()
    assert res["bbox"]["AP"] < 50.0
