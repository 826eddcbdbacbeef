import numpy as np

from u2seg_tpu.evaluation.coco_api import COCO
from u2seg_tpu.evaluation.coco_eval_core import COCOeval


def make_gt(boxes_per_image, hw=(100, 100)):
    """boxes_per_image: {img_id: [(x,y,w,h,cat), ...]}"""
    images = [
        {"id": i, "height": hw[0], "width": hw[1]} for i in boxes_per_image
    ]
    anns = []
    aid = 1
    cats = set()
    for img_id, boxes in boxes_per_image.items():
        for (x, y, w, h, c) in boxes:
            anns.append({
                "id": aid, "image_id": img_id, "category_id": c,
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
            })
            cats.add(c)
            aid += 1
    return COCO({
        "images": images,
        "annotations": anns,
        "categories": [{"id": c, "name": str(c)} for c in sorted(cats)],
    })


def run_eval(gt, dets):
    dt = gt.loadRes(dets)
    E = COCOeval(gt, dt, iouType="bbox")
    E.evaluate()
    E.accumulate()
    return E.summarize()


def test_perfect_detection_ap1():
    gt = make_gt({1: [(10, 10, 20, 20, 1), (50, 50, 30, 30, 1)]})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 30, 30], "score": 0.8},
    ]
    stats = run_eval(gt, dets)
    assert abs(stats[0] - 1.0) < 1e-6          # AP
    assert abs(stats[8] - 1.0) < 1e-6          # AR@100


def test_one_tp_one_fp():
    gt = make_gt({1: [(10, 10, 20, 20, 1), (50, 50, 30, 30, 1)]})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5], "score": 0.8},
    ]
    stats = run_eval(gt, dets)
    # 101-pt interpolation: precision 1.0 up to recall .5 => AP = 51/101
    assert abs(stats[0] - 51 / 101) < 1e-6
    assert abs(stats[8] - 0.5) < 1e-6


def test_iou_threshold_partitions():
    # detection overlaps gt with IoU exactly ~0.6: TP at thresholds .5,.55,.6
    gt = make_gt({1: [(0, 0, 10, 10, 1)]})
    # shifted box [0,4,10,10]: inter=10*6=60, union=200-60=140 -> IoU 0.4286
    # use [0,2,10,10]: inter=80, union=120 -> IoU 2/3 = .6667 -> TP at .5-.65
    dets = [{"image_id": 1, "category_id": 1, "bbox": [0, 2, 10, 10], "score": 0.9}]
    stats = run_eval(gt, dets)
    # TP at 4 of 10 thresholds (.5,.55,.6,.65) -> AP = 4/10
    assert abs(stats[0] - 0.4) < 1e-6


def test_crowd_gt_not_penalized():
    gt = make_gt({1: [(0, 0, 10, 10, 1)]})
    gt.dataset["annotations"][0]["iscrowd"] = 1
    gt.createIndex()
    # crowd-matched detections are ignored, not counted as TP or FP
    dets = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9}]
    dt = gt.loadRes(dets)
    E = COCOeval(gt, dt, iouType="bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[0] == -1.0  # no non-ignored gt -> AP undefined (-1)


def test_multi_category_and_missing_detections():
    gt = make_gt({
        1: [(0, 0, 10, 10, 1), (20, 20, 10, 10, 2)],
        2: [(5, 5, 10, 10, 1)],
    })
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 2, "category_id": 1, "bbox": [5, 5, 10, 10], "score": 0.7},
        # cat 2 undetected
    ]
    stats = run_eval(gt, dets)
    # cat1 AP=1, cat2 AP=0 -> mean 0.5
    assert abs(stats[0] - 0.5) < 1e-6


def test_segm_eval():
    import u2seg_tpu.evaluation.rle as rle_codec

    m = np.zeros((50, 50), np.uint8)
    m[10:30, 10:30] = 1
    r = rle_codec.encode(m)
    r["counts"] = r["counts"].decode("ascii")
    gt = COCO({
        "images": [{"id": 1, "height": 50, "width": 50}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "segmentation": {"size": [50, 50], "counts": r["counts"]},
            "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0,
        }],
        "categories": [{"id": 1, "name": "a"}],
    })
    dets = [{
        "image_id": 1, "category_id": 1, "score": 0.9,
        "segmentation": {"size": [50, 50], "counts": r["counts"]},
    }]
    dt = gt.loadRes(dets)
    E = COCOeval(gt, dt, iouType="segm")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert abs(stats[0] - 1.0) < 1e-6
