"""Pinned-metric e2e evaluation regression.

A deterministic 20-image synthetic mini-COCO with IMPERFECT stubbed
predictions (jittered boxes, false positives, missed instances, noisy
semantic maps) is evaluated through the full SemSeg+COCO+Panoptic stack in
both the single-pass cluster-matching mode ("auto") and the supervised
path. The resulting AP/mIoU/PQ values are asserted against committed
constants to 1e-3 — the ``verify_results`` pattern of the reference
(evaluation/testing.py:31, configs/quick_schedules/*_inference_acc_test
.yaml): ANY semantic drift in matching, RLE, COCOeval accumulation, or PQ
computation fails this test.
"""
import json
import os

import numpy as np
import pytest

from u2seg_tpu.config.config import Config
from u2seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from u2seg_tpu.engine import predictor as predictor_mod
from u2seg_tpu.pseudo.assembly import write_panoptic_png

N_IMAGES = 20
H = W = 96
CLUSTER_NUM = 6
NUM_GT_CLASSES = 3     # contiguous GT classes 0..2 (category ids 1..3)


def _gt_layout(i: int):
    """Deterministic per-image GT: 1-3 instances + one stuff band."""
    rs = np.random.RandomState(1000 + i)
    n_inst = 1 + i % 3
    insts = []
    for j in range(n_inst):
        x0 = int(rs.randint(4, 40))
        y0 = int(rs.randint(4, 40))
        bw = int(rs.randint(12, 40))
        bh = int(rs.randint(12, 40))
        cat = int((i + j) % NUM_GT_CLASSES) + 1         # category id 1..3
        insts.append((x0, y0, bw, bh, cat))
    stuff_y = int(rs.randint(60, 80))                    # stuff band rows
    stuff_super = 1 + (i % 2)                            # supercats 1 / 2
    return insts, stuff_y, stuff_super


def _pred_layout(i: int):
    """Deterministic imperfect predictions in CLUSTER space.

    Thing clusters: GT category c -> cluster 2*c-1 (majority), with every
    3rd image polluting the vote with a different cluster at low score.
    Boxes jittered; image 7 misses an instance; every 4th image adds a
    false positive. Sem cluster: supercat s -> cluster 2+s with a noisy
    corner patch.
    """
    rs = np.random.RandomState(2000 + i)
    insts, stuff_y, stuff_super = _gt_layout(i)
    preds = []
    for j, (x0, y0, bw, bh, cat) in enumerate(insts):
        if i == 7 and j == 0:
            continue                                    # a miss
        dx, dy = rs.randint(-3, 4), rs.randint(-3, 4)
        score = 0.65 + 0.3 * ((i * 7 + j * 3) % 10) / 10.0
        cluster = 2 * cat - 1
        preds.append((x0 + dx, y0 + dy, bw, bh, cluster, min(score, 0.99)))
    if i % 4 == 0:                                      # a false positive
        preds.append((60, 10, 18, 18, 2 * ((i % NUM_GT_CLASSES) + 1) - 1, 0.45))
    sem_cluster = 2 + stuff_super
    return preds, stuff_y, sem_cluster


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    import cv2

    from u2seg_tpu.data.coco import load_coco_json, load_sem_seg, merge_to_panoptic

    tmp_path = tmp_path_factory.mktemp("pinned_eval")
    img_dir = tmp_path / "images"
    sem_dir = tmp_path / "sem"
    pan_dir = tmp_path / "pan"
    for d in (img_dir, sem_dir, pan_dir):
        d.mkdir()
    from PIL import Image

    rng = np.random.RandomState(0)
    images, anns, pan_annotations = [], [], []
    ann_id = 1
    for i in range(N_IMAGES):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "height": H, "width": W})
        insts, stuff_y, stuff_super = _gt_layout(i)
        pan = np.zeros((H, W), np.int32)
        segments = []
        sem = np.zeros((H, W), np.uint8)
        sem[stuff_y:, :] = stuff_super
        pan[stuff_y:, :] = 100
        segments.append({"id": 100, "category_id": CLUSTER_NUM + stuff_super,
                         "iscrowd": 0})
        for j, (x0, y0, bw, bh, cat) in enumerate(insts):
            anns.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "bbox": [float(x0), float(y0), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
            })
            ann_id += 1
            pan[y0:y0 + bh, x0:x0 + bw] = j + 1
            sem[y0:y0 + bh, x0:x0 + bw] = 0           # things are 0 in sem GT
            segments.append({"id": j + 1, "category_id": cat, "iscrowd": 0})
        Image.fromarray(sem).save(sem_dir / f"{i}.png")
        write_panoptic_png(pan, str(pan_dir / f"{i}.png"))
        pan_annotations.append({
            "image_id": i, "file_name": f"{i}.png", "segments_info": segments,
        })

    inst_json = tmp_path / "instances.json"
    inst_json.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": c, "name": f"thing{c}"}
                       for c in range(1, NUM_GT_CLASSES + 1)],
    }))
    pan_json = tmp_path / "panoptic.json"
    pan_json.write_text(json.dumps({
        "images": images, "annotations": pan_annotations, "categories": [],
    }))

    name = "test_pinned_eval_ds"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(
        name,
        lambda: merge_to_panoptic(
            load_coco_json(str(inst_json), str(img_dir), name),
            load_sem_seg(str(sem_dir), str(img_dir)),
        ),
    )
    MetadataCatalog.get(name).set(
        json_file=str(inst_json), panoptic_json=str(pan_json),
        panoptic_root=str(pan_dir),
    )
    yield name, tmp_path
    DatasetCatalog.remove(name)


class _StubPredictor:
    def __init__(self, cfg):
        self._i = 0

    def __call__(self, img):
        i = self._i
        self._i += 1
        preds, stuff_y, sem_cluster = _pred_layout(i)
        sem = np.zeros((H, W), np.int64)
        sem[stuff_y:, :] = sem_cluster
        # noisy corner: a wrong sem cluster patch
        sem[stuff_y:stuff_y + 4, :8] = (sem_cluster % 27) + 1
        pan = np.zeros((H, W), np.int32)
        boxes, scores, classes, segments = [], [], [], []
        pan[stuff_y:, :] = 50
        segments.append({"id": 50, "category_id": sem_cluster,
                         "isthing": False, "score": 0.0})
        for j, (x0, y0, bw, bh, cluster, score) in enumerate(preds):
            boxes.append([x0, y0, x0 + bw, y0 + bh])
            scores.append(score)
            classes.append(cluster)
            pan[max(y0, 0):y0 + bh, max(x0, 0):x0 + bw] = j + 1
            segments.append({"id": j + 1, "category_id": cluster,
                             "isthing": True, "score": score})
        if not boxes:
            boxes = np.zeros((0, 4))
        return {
            "instances": {
                "boxes": np.asarray(boxes, np.float64),
                "scores": np.asarray(scores, np.float64),
                "classes": np.asarray(classes, np.int64),
            },
            "sem_seg": sem,
            "panoptic": pan,
            "segments": segments,
        }


# Values computed once from the deterministic fixture + stub predictions
# (CPU, f64 evaluators — platform-independent) and committed. A change in
# matching/RLE/COCOeval/PQ semantics shifts these.
EXPECTED = {
    "bbox_AP": 44.1896,
    "bbox_AP50": 97.3597,
    "bbox_AP75": 24.3222,
    # unmatched clusters now fall in the ignore bin (ref
    # sem_seg_evaluation.py:259-262), not the things slot — re-pinned
    "sem_mIoU": 99.5805,
    "PQ": 55.8738,
    "PQ_th": 70.9007,
    "PQ_st": 33.3333,
}


def test_pinned_metrics_cluster_matching(mini_dataset, monkeypatch, tmp_path):
    name, root = mini_dataset
    cfg = Config()
    cfg.datasets.test = (name,)
    cfg.datasets.cluster_num = CLUSTER_NUM
    cfg.model.sem_seg_head.num_classes = 28

    monkeypatch.setattr(predictor_mod, "DefaultPredictor", _StubPredictor)
    monkeypatch.setattr(
        "u2seg_tpu.data.builtin.register_all_coco", lambda *a, **k: None
    )
    monkeypatch.chdir(tmp_path)

    results = predictor_mod.run_panoptic_evaluation(cfg, eval_mode="auto")
    res = results[name]
    assert res["bbox"]["AP"] == pytest.approx(EXPECTED["bbox_AP"], abs=1e-3)
    assert res["bbox"]["AP50"] == pytest.approx(EXPECTED["bbox_AP50"], abs=1e-3)
    assert res["bbox"]["AP75"] == pytest.approx(EXPECTED["bbox_AP75"], abs=1e-3)
    assert res["sem_seg"]["mIoU"] == pytest.approx(EXPECTED["sem_mIoU"], abs=1e-3)
    assert res["panoptic_seg"]["PQ"] == pytest.approx(EXPECTED["PQ"], abs=1e-3)
    assert res["panoptic_seg"]["PQ_th"] == pytest.approx(
        EXPECTED["PQ_th"], abs=1e-3)
    assert res["panoptic_seg"]["PQ_st"] == pytest.approx(
        EXPECTED["PQ_st"], abs=1e-3)
    # the mapping artifacts must record the expected majority votes
    with open(tmp_path / "hungarian_matching/instance_mapping.json") as f:
        imap = json.load(f)
    for cat in range(1, NUM_GT_CLASSES + 1):
        assert int(imap[str(2 * cat - 1)]) == cat - 1   # contiguous GT ids
