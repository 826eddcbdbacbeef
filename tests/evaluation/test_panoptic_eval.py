import numpy as np

from u2seg_tpu.evaluation.panoptic_eval_core import pq_compute, pq_compute_single_image, PQStat


CATS = {
    1: {"id": 1, "isthing": 1, "name": "thing1"},
    2: {"id": 2, "isthing": 0, "name": "stuff1"},
}


def seg(sid, cat, **kw):
    d = {"id": sid, "category_id": cat}
    d.update(kw)
    return d


def test_perfect_match_pq1():
    pan = np.zeros((10, 10), np.int32)
    pan[:5] = 1
    pan[5:] = 2
    segs = [seg(1, 1), seg(2, 2)]
    res = pq_compute([(pan, segs)], [(pan.copy(), segs)], CATS)
    assert abs(res["All"]["pq"] - 1.0) < 1e-9
    assert abs(res["Things"]["pq"] - 1.0) < 1e-9
    assert abs(res["Stuff"]["pq"] - 1.0) < 1e-9


def test_partial_overlap():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :10] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:8, :] = 1  # IoU 0.8
    stat = pq_compute_single_image(gt, pred, [seg(1, 1)], [seg(1, 1)], CATS)
    s = stat[1]
    assert s.tp == 1 and s.fp == 0 and s.fn == 0
    assert abs(s.iou - 0.8) < 1e-9


def test_below_half_iou_is_fp_and_fn():
    # second gt segment occupies rows 5-9 so pred isn't excused by VOID
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    gt[5:] = 9
    pred = np.zeros((10, 10), np.int32)
    pred[4:] = 1  # IoU vs gt1: 10/(50+60-10) ≈ .1
    gt_segs = [seg(1, 1), seg(9, 2)]
    stat = pq_compute_single_image(gt, pred, gt_segs, [seg(1, 1)], CATS)
    s = stat[1]
    assert s.tp == 0 and s.fp == 1 and s.fn == 1
    res = pq_compute([(gt, gt_segs)], [(pred, [seg(1, 1)])], CATS)
    assert res["Things"]["pq"] == 0.0


def test_mostly_void_pred_excused():
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[4:] = 1  # 50 of its 60 px on VOID -> excused from FP
    stat = pq_compute_single_image(gt, pred, [seg(1, 1)], [seg(1, 1)], CATS)
    s = stat[1]
    assert s.tp == 0 and s.fp == 0 and s.fn == 1


def test_class_mismatch_no_match():
    gt = np.ones((4, 4), np.int32)
    pred = np.ones((4, 4), np.int32)
    stat = pq_compute_single_image(gt, pred, [seg(1, 1)], [seg(1, 2)], CATS)
    assert stat[1].fn == 1
    assert stat[2].fp == 1


def test_void_excuses_fp():
    # pred segment living mostly on VOID gt is not an FP
    gt = np.zeros((10, 10), np.int32)  # all VOID
    gt[0, 0] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:, :] = 5
    stat = pq_compute_single_image(
        gt, pred, [seg(1, 1)], [seg(5, 1)], CATS
    )
    # pred overlaps VOID on 99% of its area -> excused
    assert stat[1].fp == 0


def test_crowd_excuses_fp_but_no_match():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :] = 7  # crowd region of class 1
    pred = np.zeros((10, 10), np.int32)
    pred[:, :] = 3
    stat = pq_compute_single_image(
        gt, pred, [seg(7, 1, iscrowd=1)], [seg(3, 1)], CATS
    )
    s = stat[1]
    assert s.tp == 0 and s.fp == 0 and s.fn == 0  # crowd: no match, no penalty


def test_absent_category_excluded_from_average():
    pan = np.ones((4, 4), np.int32)
    res = pq_compute([(pan, [seg(1, 1)])], [(pan, [seg(1, 1)])], CATS)
    # class 2 never appears -> n=1, averages over class 1 only
    assert res["All"]["n"] == 1
    assert abs(res["All"]["pq"] - 1.0) < 1e-9
