"""OKS keypoint evaluation (pycocotools iouType='keypoints' parity).

Oracle: an independent numpy transcription of the published OKS formula
(pycocotools cocoeval.py computeOks) and exact AP expectations on
synthetic predictions.
"""
import numpy as np

from u2seg_tpu.evaluation.coco_api import COCO
from u2seg_tpu.evaluation.coco_eval_core import (
    COCO_KPT_OKS_SIGMAS, COCOeval,
)


def _oks_oracle(dt_kp, gt_kp, gt_bbox, gt_area, sigmas):
    xg, yg, vg = gt_kp[0::3], gt_kp[1::3], gt_kp[2::3]
    xd, yd = dt_kp[0::3], dt_kp[1::3]
    var = (sigmas * 2) ** 2
    k1 = np.count_nonzero(vg > 0)
    if k1 > 0:
        dx, dy = xd - xg, yd - yg
    else:
        x0, x1 = gt_bbox[0] - gt_bbox[2], gt_bbox[0] + 2 * gt_bbox[2]
        y0, y1 = gt_bbox[1] - gt_bbox[3], gt_bbox[1] + 2 * gt_bbox[3]
        z = np.zeros(len(sigmas))
        dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
        dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
    e = (dx ** 2 + dy ** 2) / var / (gt_area + np.spacing(1)) / 2
    if k1 > 0:
        e = e[vg > 0]
    return np.sum(np.exp(-e)) / len(e)


def _gt_dataset(rng, n_images=3, n_inst=2):
    images, anns = [], []
    aid = 1
    kp_store = {}
    for i in range(n_images):
        images.append({"id": i, "height": 400, "width": 600})
        for _ in range(n_inst):
            x, y = rng.rand() * 300, rng.rand() * 200
            w, h = 80 + rng.rand() * 100, 120 + rng.rand() * 100
            kp = np.zeros((17, 3))
            kp[:, 0] = x + rng.rand(17) * w
            kp[:, 1] = y + rng.rand(17) * h
            kp[:, 2] = rng.choice([0, 1, 2], 17, p=[0.2, 0.3, 0.5])
            anns.append({
                "id": aid, "image_id": i, "category_id": 1,
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                "keypoints": kp.reshape(-1).tolist(),
                "num_keypoints": int((kp[:, 2] > 0).sum()),
            })
            kp_store[aid] = kp
            aid += 1
    gt = COCO({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "person"}]})
    return gt, anns


def test_compute_oks_matches_oracle():
    rng = np.random.RandomState(0)
    gt, anns = _gt_dataset(rng)
    dts, gts = [], []
    for a in anns[:3]:
        gts.append(a)
        kp = np.asarray(a["keypoints"]).reshape(17, 3).copy()
        kp[:, :2] += rng.randn(17, 2) * 5
        dts.append({"keypoints": kp.reshape(-1).tolist(), "score": 0.9,
                    "bbox": a["bbox"]})
    ev = COCOeval(gt, None, iouType="keypoints")
    got = ev.computeOks(dts, gts)
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            want = _oks_oracle(
                np.asarray(d["keypoints"]), np.asarray(g["keypoints"]),
                g["bbox"], g["area"], COCO_KPT_OKS_SIGMAS)
            np.testing.assert_allclose(got[i, j], want, rtol=1e-10)

    # zero-labeled GT: distances to the expanded box
    g0 = dict(gts[0])
    kp = np.asarray(g0["keypoints"]).reshape(17, 3).copy()
    kp[:, 2] = 0
    g0["keypoints"] = kp.reshape(-1).tolist()
    got0 = ev.computeOks(dts, [g0])
    want0 = _oks_oracle(np.asarray(dts[0]["keypoints"]),
                        np.asarray(g0["keypoints"]), g0["bbox"],
                        g0["area"], COCO_KPT_OKS_SIGMAS)
    np.testing.assert_allclose(got0[0, 0], want0, rtol=1e-10)


def _results_from_gt(anns, noise=0.0, rng=None):
    out = []
    for a in anns:
        kp = np.asarray(a["keypoints"], np.float64).reshape(17, 3).copy()
        if noise:
            kp[:, :2] += rng.randn(17, 2) * noise
        kp[:, 2] = 1.0
        out.append({
            "image_id": a["image_id"], "category_id": 1,
            "bbox": list(a["bbox"]), "score": 0.95,
            "keypoints": kp.reshape(-1).tolist(),
        })
    return out


def test_keypoint_ap_perfect_and_noisy():
    rng = np.random.RandomState(1)
    gt, anns = _gt_dataset(rng)

    def run(results):
        dt = gt.loadRes(results)
        ev = COCOeval(gt, dt, iouType="keypoints")
        ev.evaluate()
        ev.accumulate()
        return ev.summarize()

    stats = run(_results_from_gt(anns))
    assert stats[0] == 1.0 and stats[1] == 1.0   # AP, AP50 perfect

    noisy = run(_results_from_gt(anns, noise=25.0, rng=rng))
    assert noisy[0] < stats[0]

    # far-off predictions score ~0
    far = _results_from_gt(anns)
    for r in far:
        kp = np.asarray(r["keypoints"]).reshape(17, 3)
        kp[:, :2] += 5000.0
        r["keypoints"] = kp.reshape(-1).tolist()
    assert run(far)[0] <= 0.0


def test_keypoint_gt_without_labels_is_ignored():
    rng = np.random.RandomState(2)
    gt, anns = _gt_dataset(rng, n_images=1, n_inst=2)
    # strip labels from the second GT: it must not count as a miss
    kp = np.asarray(anns[1]["keypoints"]).reshape(17, 3)
    kp[:, 2] = 0
    anns[1]["keypoints"] = kp.reshape(-1).tolist()
    anns[1]["num_keypoints"] = 0
    gt = COCO({"images": gt.dataset["images"], "annotations": anns,
               "categories": [{"id": 1, "name": "person"}]})
    results = _results_from_gt(anns[:1])
    dt = gt.loadRes(results)
    ev = COCOeval(gt, dt, iouType="keypoints")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    # precision over the one labeled GT only (float-rounding tolerant)
    np.testing.assert_allclose(stats[0], 1.0, rtol=1e-12)


def test_evaluator_keypoints_task():
    from u2seg_tpu.evaluation.coco_evaluator import COCOEvaluator

    rng = np.random.RandomState(3)
    gt, anns = _gt_dataset(rng, n_images=2, n_inst=2)
    ev = COCOEvaluator(gt, mode="supervised", tasks=("bbox", "keypoints"))
    by_img = {}
    for a in anns:
        by_img.setdefault(a["image_id"], []).append(a)
    for img_id, group in by_img.items():
        boxes = np.array([[a["bbox"][0], a["bbox"][1],
                           a["bbox"][0] + a["bbox"][2],
                           a["bbox"][1] + a["bbox"][3]] for a in group])
        kpts = np.stack([np.asarray(a["keypoints"]).reshape(17, 3)
                         for a in group])
        # process() subtracts the 0.5 heatmap-center offset; pre-add it so
        # the stored results coincide with GT
        kpts[..., :2] += 0.5
        kpts[..., 2] = 1.0
        ev.process(
            [{"image_id": img_id}],
            [{"instances": {
                "boxes": boxes,
                "scores": np.full(len(group), 0.9),
                "classes": np.ones(len(group), np.int64),
                "keypoints": kpts,
            }}],
        )
    res = ev.evaluate()
    assert res["keypoints"]["AP"] == 100.0
    assert res["bbox"]["AP"] == 100.0
