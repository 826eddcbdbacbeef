"""Golden-file tests for the U2Seg matching protocol — coverage the
reference never had (SURVEY.md §4 item 10)."""
import json
import os

import numpy as np
import pytest

from u2seg_tpu.evaluation import hungarian
from u2seg_tpu.evaluation.coco_api import COCO
from u2seg_tpu.evaluation.coco_evaluator import COCOEvaluator
from u2seg_tpu.evaluation.sem_seg_evaluator import (
    SemSegEvaluator, transfer_gt_to_supercategories,
)
from u2seg_tpu.evaluation.panoptic_evaluator import COCOPanopticEvaluator


def test_majority_vote():
    pred = np.array([0, 0, 0, 1, 1, 2])
    gt = np.array([3, 3, 4, 5, 5, 6])
    m = hungarian.majority_vote_mapping(pred, gt, num_clusters=4, num_classes=10)
    assert m == {0: 3, 1: 5, 2: 6, 3: -1}


def test_mine_instance_pairs_thresholds():
    results = [
        {"image_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9, "category_id": 5},
        {"image_id": 1, "bbox": [0, 0, 10, 10], "score": 0.5, "category_id": 6},  # low score
        {"image_id": 1, "bbox": [50, 50, 10, 10], "score": 0.9, "category_id": 7},  # no overlap
    ]
    gt_by_image = {1: [{"bbox": [0, 0, 10, 10], "category_id": 17}]}
    id_map = {17: 2}
    p, g = hungarian.mine_instance_pairs(results, gt_by_image, id_map)
    assert p.tolist() == [5] and g.tolist() == [2]


def test_instance_mapping_roundtrip(tmp_path):
    m = {0: 3, 1: -1, 2: 7}
    path = str(tmp_path / "instance_mapping.json")
    hungarian.save_mapping(m, path)
    assert hungarian.load_mapping(path) == m


def test_remap_drops_unmatched():
    results = [
        {"category_id": 0, "score": 1.0},
        {"category_id": 1, "score": 1.0},
    ]
    out = hungarian.remap_instance_results(
        results, {0: 2, 1: -1}, {2: 21}
    )
    assert len(out) == 1 and out[0]["category_id"] == 21


def make_coco_gt():
    return COCO({
        "images": [{"id": 1, "height": 100, "width": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 17,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 18,
             "bbox": [60, 60, 20, 20], "area": 400, "iscrowd": 0},
        ],
        "categories": [{"id": 17, "name": "cat"}, {"id": 18, "name": "dog"}],
    })


def test_coco_evaluator_auto_mode(tmp_path):
    gt = make_coco_gt()
    ev = COCOEvaluator(
        gt, mode="auto", num_clusters=4, tasks=("bbox",),
        matching_dir=str(tmp_path),
    )
    ev.reset()
    # cluster 0 predicts the cat box, cluster 2 the dog box
    outputs = [{
        "instances": {
            "boxes": np.array([[10, 10, 30, 30], [60, 60, 80, 80]], np.float64),
            "scores": np.array([0.95, 0.9]),
            "classes": np.array([0, 2]),
        }
    }]
    ev.process([{"image_id": 1}], outputs)
    res = ev.evaluate()
    # mapping: cluster0 -> contiguous 0 (cat=17), cluster2 -> 1 (dog=18)
    mapping = hungarian.load_mapping(str(tmp_path / "instance_mapping.json"))
    assert mapping[0] == 0 and mapping[2] == 1
    assert mapping[1] == -1 and mapping[3] == -1
    assert abs(res["bbox"]["AP"] - 100.0) < 1e-6


def test_coco_evaluator_two_pass(tmp_path):
    gt = make_coco_gt()
    outputs = [{
        "instances": {
            "boxes": np.array([[10, 10, 30, 30]], np.float64),
            "scores": np.array([0.95]),
            "classes": np.array([3]),
        }
    }]
    ev1 = COCOEvaluator(gt, mode="hungarian_matching", num_clusters=4,
                        tasks=("bbox",), matching_dir=str(tmp_path))
    ev1.reset()
    ev1.process([{"image_id": 1}], outputs)
    r1 = ev1.evaluate()
    assert "instance_mapping" in r1
    ev2 = COCOEvaluator(gt, mode="eval", num_clusters=4, tasks=("bbox",),
                        matching_dir=str(tmp_path))
    ev2.reset()
    ev2.process([{"image_id": 1}], outputs)
    r2 = ev2.evaluate()
    # cluster 3 -> cat; one gt matched perfectly, dog missed -> AP 50
    assert abs(r2["bbox"]["AP"] - 50.0) < 1e-6


def test_transfer_gt():
    gt = np.array([[0, 1, 2], [53, 255, 0]])
    out = transfer_gt_to_supercategories(gt)
    # contiguous 1 = banner -> textile(1); 2 = blanket -> 1; 53 = rug -> 1
    assert out[0, 1] == 1 and out[0, 2] == 1 and out[1, 0] == 1
    assert out[0, 0] == 0 and out[1, 1] == 255


def test_sem_seg_evaluator_auto(tmp_path):
    ev = SemSegEvaluator(mode="auto", num_pred_classes=28,
                         matching_dir=str(tmp_path))
    ev.reset()
    # pred cluster 5 covers the same area as gt stuff contiguous 1 (-> super 1)
    pred = np.zeros((20, 20), np.int64)
    pred[:10] = 5
    gt = np.zeros((20, 20), np.int64)
    gt[:10] = 1   # banner -> supercategory 1
    ev.process([{"sem_seg_gt": gt}], [{"sem_seg": pred}])
    res = ev.evaluate()
    mapping = hungarian.load_mapping(str(tmp_path / "semantic_mapping.json"))
    assert mapping[5] == 1
    assert res["sem_seg"]["mIoU"] > 99.0  # both classes perfectly segmented


def test_panoptic_evaluator_with_mappings(tmp_path):
    hungarian.save_mapping({0: 0, 1: -1}, str(tmp_path / "instance_mapping.json"))
    hungarian.save_mapping({0: 0, 1: 2}, str(tmp_path / "semantic_mapping.json"))
    cluster_num = 300
    categories = {
        1: {"id": 1, "isthing": 1},
        cluster_num + 2: {"id": cluster_num + 2, "isthing": 0},
    }
    ev = COCOPanopticEvaluator(
        categories, thing_contiguous_to_dataset={0: 1},
        cluster_num=cluster_num, matching_dir=str(tmp_path), mode="eval",
    )
    ev.reset()
    pan_pred = np.zeros((10, 10), np.int32)
    pan_pred[:5] = 7   # thing cluster 0 -> dataset 1
    pan_pred[5:] = 9   # stuff cluster 1 -> super 2 -> dataset 302
    segments = [
        {"id": 7, "category_id": 0, "isthing": True},
        {"id": 9, "category_id": 1, "isthing": False},
    ]
    pan_gt = np.zeros((10, 10), np.int32)
    pan_gt[:5] = 1
    pan_gt[5:] = 2
    gt_segments = [
        {"id": 1, "category_id": 1},
        {"id": 2, "category_id": cluster_num + 2},
    ]
    ev.process(
        [{"pan_gt": pan_gt, "gt_segments": gt_segments}],
        [{"panoptic": pan_pred, "segments": segments}],
    )
    res = ev.evaluate()
    assert abs(res["panoptic_seg"]["PQ"] - 100.0) < 1e-6
    assert abs(res["panoptic_seg"]["PQ_th"] - 100.0) < 1e-6
    assert abs(res["panoptic_seg"]["PQ_st"] - 100.0) < 1e-6


def test_panoptic_unmatched_cluster_zeroed(tmp_path):
    hungarian.save_mapping({0: -1}, str(tmp_path / "instance_mapping.json"))
    hungarian.save_mapping({0: 0}, str(tmp_path / "semantic_mapping.json"))
    categories = {1: {"id": 1, "isthing": 1}}
    ev = COCOPanopticEvaluator(
        categories, {0: 1}, cluster_num=300,
        matching_dir=str(tmp_path), mode="eval",
    )
    ev.reset()
    pan_pred = np.full((4, 4), 3, np.int32)
    ev.process(
        [{"pan_gt": np.zeros((4, 4), np.int32), "gt_segments": []}],
        [{"panoptic": pan_pred,
          "segments": [{"id": 3, "category_id": 0, "isthing": True}]}],
    )
    res = ev.evaluate()
    # unmatched cluster zeroed -> nothing predicted, nothing gt -> PQ n=0
    assert res["panoptic_seg"]["PQ"] == 0.0


# ---------------------------------------------------------------------------
# Boundary IoU (ref sem_seg_evaluation.py:269-277,344-356,396-407)
# ---------------------------------------------------------------------------

def _boundary_oracle(mask: np.ndarray, iterations: int) -> np.ndarray:
    """Independent min-filter erosion (the reference uses cv2.erode on the
    zero-padded label map); boundary = mask - eroded."""
    padded = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), mask.dtype)
    padded[1:-1, 1:-1] = mask
    for _ in range(iterations):
        nxt = padded.copy()
        h, w = padded.shape
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                shifted = np.full_like(padded, 0)
                ys = slice(max(0, dy), min(h, h + dy))
                xs = slice(max(0, dx), min(w, w + dx))
                ys_src = slice(max(0, -dy), min(h, h - dy))
                xs_src = slice(max(0, -dx), min(w, w - dx))
                shifted[ys, xs] = padded[ys_src, xs_src]
                nxt = np.minimum(nxt, shifted)
        padded = nxt
    return mask - padded[1:-1, 1:-1]


def test_mask_to_boundary_matches_min_filter_oracle():
    from u2seg_tpu.evaluation.sem_seg_evaluator import mask_to_boundary

    rng = np.random.RandomState(0)
    mask = rng.randint(0, 5, (30, 44)).astype(np.uint8)
    # coarsen into blobby regions
    mask = np.repeat(np.repeat(mask[::3, ::4], 3, 0), 4, 1)[:30, :44]
    dil = max(1, int(round(0.02 * np.sqrt(30 ** 2 + 44 ** 2))))
    expected = _boundary_oracle(mask, dil)
    got = mask_to_boundary(mask)
    np.testing.assert_array_equal(got, expected)


def test_supervised_boundary_iou_perfect_prediction():
    ev = SemSegEvaluator(mode="supervised", num_pred_classes=4)
    rng = np.random.RandomState(1)
    gt = np.repeat(np.repeat(rng.randint(0, 4, (8, 8)), 8, 0), 8, 1)
    ev.process([{"sem_seg_gt": gt}], [{"sem_seg": gt.copy()}])
    res = ev.evaluate()["sem_seg"]
    assert res["mIoU"] == pytest.approx(100.0)
    for i in range(4):
        b = res[f"BoundaryIoU-{i}"]
        assert np.isnan(b) or b == pytest.approx(100.0)
    assert res["min(IoU, B-Iou)-0"] == pytest.approx(100.0) or np.isnan(
        res["min(IoU, B-Iou)-0"])


def test_supervised_boundary_iou_penalizes_boundary_errors():
    """A prediction that is correct in region interiors but shifted at the
    boundaries keeps a high mIoU while Boundary IoU drops."""
    gt = np.zeros((64, 64), np.int64)
    gt[:, 32:] = 1
    pred = np.zeros_like(gt)
    pred[:, 30:] = 1   # 2-px boundary shift
    ev = SemSegEvaluator(mode="supervised", num_pred_classes=2)
    ev.process([{"sem_seg_gt": gt}], [{"sem_seg": pred}])
    res = ev.evaluate()["sem_seg"]
    assert res["mIoU"] > 90.0
    assert res["BoundaryIoU-1"] < res["IoU-1"]


def test_eval_mode_unmatched_cluster_goes_to_ignore_bin(tmp_path):
    """Unmatched pred clusters must land in the extra bin (ref :259-262),
    not pollute the things class 0."""
    matching_dir = str(tmp_path / "hm")
    # mapping: cluster 1 -> supercat 2; cluster 2 unmatched
    hungarian.save_mapping({0: 0, 1: 2, 2: -1},
                           os.path.join(matching_dir, "semantic_mapping.json"))
    ev = SemSegEvaluator(mode="eval", num_pred_classes=3,
                         matching_dir=matching_dir)
    gt = np.full((32, 32), 2, np.int64)      # supercat 2 everywhere
    pred = np.full((32, 32), 1, np.int64)
    pred[:, 16:] = 2                          # right half: unmatched cluster
    ev.process([{"sem_seg_gt": np.full((32, 32), 300, np.int64)}], [{}])
    ev._pairs = [(pred, gt)]
    res = ev.evaluate()["sem_seg"]
    # unmatched half must not appear as class-0 prediction
    assert ev._conf_matrix[0].sum() == 0
    assert ev._conf_matrix[ev._num_classes, 2] == 32 * 16
    # the extra bin is excluded from pos_gt/union, so the matched half
    # scores perfectly — the reference's (generous) semantics
    assert res["IoU-2"] == pytest.approx(100.0)
    assert res["pACC"] == pytest.approx(100.0)
