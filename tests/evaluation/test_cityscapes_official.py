"""Official-protocol cityscapes instance AP
(evaluation/cityscapes_instance_ap.py) — hand-built cases encoding the
behaviors that distinguish it from COCO AP (cityscapesscripts
evalInstanceLevelSemanticLabeling semantics)."""
import numpy as np

from u2seg_tpu.evaluation.cityscapes_instance_ap import (
    evaluate_instance_ap,
)


def _box_mask(h, w, y0, x0, y1, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


H, W = 64, 96


def test_perfect_match_gives_ap_1():
    m = _box_mask(H, W, 8, 8, 40, 40)
    res = evaluate_instance_ap(
        {0: [{"mask": m, "class": 0}]},
        {0: [{"mask": m.copy(), "class": 0, "score": 0.9}]},
        num_classes=2, min_region_size=10,
    )
    assert res["AP"] == 1.0 and res["AP50"] == 1.0
    # class 1 has no GT anywhere -> nan, excluded from the mean
    assert np.isnan(res["per_class"][1])


def test_duplicate_match_keeps_high_confidence():
    """Two predictions on one GT: the higher confidence stays TP, the other
    becomes an FP carrying the LOWER score — AP50 stays 1.0 because the TP
    outranks the injected FP on the curve."""
    m = _box_mask(H, W, 8, 8, 40, 40)
    res = evaluate_instance_ap(
        {0: [{"mask": m, "class": 0}]},
        {0: [{"mask": m.copy(), "class": 0, "score": 0.9},
             {"mask": m.copy(), "class": 0, "score": 0.6}]},
        num_classes=1, min_region_size=10,
    )
    assert res["AP50"] == 1.0
    # by contrast an FP OUTRANKING the TP halves the early precision
    res2 = evaluate_instance_ap(
        {0: [{"mask": m, "class": 0}]},
        {0: [{"mask": m.copy(), "class": 0, "score": 0.9},
             {"mask": _box_mask(H, W, 50, 50, 60, 90), "class": 0,
              "score": 0.95}]},
        num_classes=1, min_region_size=10,
    )
    assert res2["AP50"] < 1.0


def test_prediction_on_ignore_region_is_not_fp():
    gt = _box_mask(H, W, 8, 8, 40, 40)
    crowd = _box_mask(H, W, 45, 45, 64, 96)
    inside_crowd = _box_mask(H, W, 48, 48, 60, 80)
    base = {
        0: [{"mask": gt, "class": 0},
            {"mask": crowd, "class": 0, "ignore": True}],
    }
    preds_clean = {0: [{"mask": gt.copy(), "class": 0, "score": 0.9}]}
    preds_crowd = {0: [{"mask": gt.copy(), "class": 0, "score": 0.9},
                       {"mask": inside_crowd, "class": 0, "score": 0.95}]}
    r_clean = evaluate_instance_ap(base, preds_clean, 1, min_region_size=10)
    r_crowd = evaluate_instance_ap(base, preds_crowd, 1, min_region_size=10)
    # the prediction fully inside the crowd region must not count as FP
    assert r_crowd["AP50"] == r_clean["AP50"] == 1.0


def test_undersized_gt_excluded_and_absorbs_predictions():
    tiny = _box_mask(H, W, 0, 0, 5, 5)          # 25 px < min_region_size
    big = _box_mask(H, W, 8, 8, 40, 40)
    gts = {0: [{"mask": tiny, "class": 0}, {"mask": big, "class": 0}]}
    preds = {0: [{"mask": big.copy(), "class": 0, "score": 0.9},
                 {"mask": tiny.copy(), "class": 0, "score": 0.95}]}
    res = evaluate_instance_ap(gts, preds, 1, min_region_size=100)
    # tiny GT is excluded; the pred on it is absorbed by the ignore pool
    assert res["AP50"] == 1.0


def test_hard_false_negative_caps_recall():
    g1 = _box_mask(H, W, 8, 8, 30, 30)
    g2 = _box_mask(H, W, 8, 50, 30, 80)
    gts = {0: [{"mask": g1, "class": 0}, {"mask": g2, "class": 0}]}
    preds = {0: [{"mask": g1.copy(), "class": 0, "score": 0.9}]}
    res = evaluate_instance_ap(gts, preds, 1, min_region_size=10)
    # one TP, one hard FN: precision 1 at recall 0.5.
    # official curve: precision [1, 1], recall [0.5, 0]; step widths
    # [(0.5-0)/2, (0.5-0)/2] -> AP = 0.5
    assert abs(res["AP50"] - 0.5) < 1e-9


def test_void_region_ignores_any_class():
    gt = _box_mask(H, W, 8, 8, 40, 40)
    void = _box_mask(H, W, 45, 45, 64, 96)
    gts = {0: [{"mask": gt, "class": 0}, {"mask": void, "class": -1}]}
    preds = {0: [{"mask": gt.copy(), "class": 0, "score": 0.9},
                 {"mask": _box_mask(H, W, 48, 48, 62, 90), "class": 0,
                  "score": 0.95}]}
    res = evaluate_instance_ap(gts, preds, 1, min_region_size=10)
    assert res["AP50"] == 1.0


def test_gt_without_predictions_scores_zero():
    gt = _box_mask(H, W, 8, 8, 40, 40)
    res = evaluate_instance_ap(
        {0: [{"mask": gt, "class": 0}]}, {0: []}, 1, min_region_size=10)
    assert res["AP"] == 0.0


def test_partial_overlap_spans_thresholds():
    """A prediction with IoU ~0.7 counts at overlaps <0.7 and misses
    above, so AP < AP50."""
    gt = _box_mask(H, W, 0, 0, 40, 40)
    pred = _box_mask(H, W, 0, 0, 40, 28)        # IoU = 0.7
    res = evaluate_instance_ap(
        {0: [{"mask": gt, "class": 0}]},
        {0: [{"mask": pred, "class": 0, "score": 0.9}]},
        num_classes=1, min_region_size=10,
    )
    assert res["AP50"] == 1.0
    iou = (40 * 28) / (40 * 40)
    n_pass = int(np.sum(np.arange(0.5, 1.0, 0.05) < iou - 1e-9))
    assert abs(res["AP"] - n_pass / 10.0) < 1e-9


def test_instance_evaluator_end_to_end_official_path():
    """CityscapesInstanceEvaluator with mask predictions routes through the
    official protocol (RLE GT + crowd region + one TP + one crowd-absorbed
    prediction)."""
    from u2seg_tpu.evaluation import rle as rle_codec
    from u2seg_tpu.evaluation.cityscapes_evaluator import (
        CityscapesInstanceEvaluator,
    )

    gt = _box_mask(H, W, 8, 8, 40, 40)
    crowd = _box_mask(H, W, 45, 45, 64, 96)
    dataset_dicts = [{
        "image_id": 7, "height": H, "width": W,
        "annotations": [
            {"category_id": 0, "bbox": [8, 8, 32, 32],
             "area": int(gt.sum()), "iscrowd": 0,
             "segmentation": rle_codec.encode(gt.astype(np.uint8))},
            {"category_id": 0, "bbox": [45, 45, 51, 19],
             "area": int(crowd.sum()), "iscrowd": 1,
             "segmentation": rle_codec.encode(crowd.astype(np.uint8))},
        ],
    }]
    ev = CityscapesInstanceEvaluator(dataset_dicts)
    ev.reset()
    in_crowd = _box_mask(H, W, 48, 48, 60, 80)
    rles = [rle_codec.encode(gt.astype(np.uint8)),
            rle_codec.encode(in_crowd.astype(np.uint8))]
    ev.process(
        [{"image_id": 7}],
        [{"instances": {
            "boxes": np.array([[8, 8, 40, 40], [48, 48, 80, 60]], float),
            "scores": np.array([0.9, 0.95]),
            "classes": np.array([0, 0]),
            "rles": rles,
        }}],
    )
    res = ev.evaluate()["cityscapes_instance"]
    assert res["AP50"] == 100.0
    assert res["AP"] == 100.0
