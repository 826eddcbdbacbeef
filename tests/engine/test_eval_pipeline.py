"""Integration test of the evaluation driver: dataset registration ->
sampler -> (stubbed) predictor -> SemSeg+COCO+Panoptic evaluators with the
single-pass 'auto' cluster-matching protocol."""
import json
import os

import numpy as np
import pytest

from u2seg_tpu.config.config import Config
from u2seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from u2seg_tpu.engine import predictor as predictor_mod
from u2seg_tpu.pseudo.assembly import write_panoptic_png


@pytest.fixture
def fake_dataset(tmp_path, rng, monkeypatch):
    """Synthetic 2-image dataset with instance json, sem-seg pngs and
    panoptic GT, registered under a temporary name."""
    import cv2
    from PIL import Image

    img_dir = tmp_path / "images"
    sem_dir = tmp_path / "sem"
    pan_dir = tmp_path / "pan"
    for d in (img_dir, sem_dir, pan_dir):
        d.mkdir()
    h = w = 64
    images, anns = [], []
    cluster_num = 4
    pan_annotations = []
    for i in range(2):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        anns.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "bbox": [8.0, 8.0, 24.0, 24.0], "area": 576.0, "iscrowd": 0,
        })
        # sem-seg GT: contiguous stuff encoding (0 things, 1..53 stuff)
        sem = np.zeros((h, w), np.uint8)
        sem[40:, :] = 1  # banner -> supercategory 1
        Image.fromarray(sem).save(sem_dir / f"{i}.png")
        # panoptic GT: thing segment (cat 17) + stuff (supercat 1 -> 405)
        pan = np.zeros((h, w), np.int32)
        pan[8:32, 8:32] = 1
        pan[40:, :] = 2
        write_panoptic_png(pan, str(pan_dir / f"{i}.png"))
        pan_annotations.append({
            "image_id": i, "file_name": f"{i}.png",
            "segments_info": [
                {"id": 1, "category_id": 1, "iscrowd": 0},
                {"id": 2, "category_id": cluster_num + 1, "iscrowd": 0},
            ],
        })
    inst_json = tmp_path / "instances.json"
    inst_json.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "person"}],
    }))
    pan_json = tmp_path / "panoptic.json"
    pan_json.write_text(json.dumps({
        "images": images, "annotations": pan_annotations,
        "categories": [],
    }))
    name = "test_eval_pipeline_ds"
    for n in (name,):
        if n in DatasetCatalog:
            DatasetCatalog.remove(n)
    from u2seg_tpu.data.coco import load_coco_json, load_sem_seg, merge_to_panoptic

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
    yield name, cluster_num, tmp_path
    DatasetCatalog.remove(name)


def test_run_panoptic_evaluation_auto(fake_dataset, tmp_path, monkeypatch):
    name, cluster_num, root = fake_dataset
    cfg = Config()
    cfg.datasets.test = (name,)
    cfg.datasets.cluster_num = cluster_num
    cfg.model.sem_seg_head.num_classes = 28

    class StubPredictor:
        """Perfect predictions in cluster space: cluster 2 on the GT box,
        sem cluster 5 on the stuff region, panoptic segments to match."""

        def __init__(self, cfg):
            pass

        def __call__(self, img):
            h, w = img.shape[:2]
            sem = np.zeros((h, w), np.int64)
            sem[40:, :] = 5
            pan = np.zeros((h, w), np.int32)
            pan[8:32, 8:32] = 1
            pan[40:, :] = 9
            return {
                "instances": {
                    "boxes": np.array([[8.0, 8.0, 32.0, 32.0]]),
                    "scores": np.array([0.95]),
                    "classes": np.array([2]),
                },
                "sem_seg": sem,
                "panoptic": pan,
                "segments": [
                    {"id": 1, "category_id": 2, "isthing": True, "score": 0.95},
                    {"id": 9, "category_id": 5, "isthing": False, "score": 0.0},
                ],
            }

    monkeypatch.setattr(predictor_mod, "DefaultPredictor", StubPredictor)
    monkeypatch.chdir(tmp_path)  # hungarian_matching/ artifacts land here

    # register_all_coco registers the standard names; ours is already there
    monkeypatch.setattr(
        "u2seg_tpu.data.builtin.register_all_coco", lambda *a, **k: None
    )
    results = predictor_mod.run_panoptic_evaluation(cfg, eval_mode="auto")
    res = results[name]
    # instance mapping: cluster 2 -> contiguous 0 (person); perfect AP
    assert res["bbox"]["AP"] == pytest.approx(100.0, abs=1e-6)
    # semantic: cluster 5 -> supercategory 1; perfect mIoU over {0,1}
    assert res["sem_seg"]["mIoU"] > 99.0
    # panoptic: thing remapped to person(1), stuff to cluster_num+1; PQ = 100
    assert res["panoptic_seg"]["PQ"] == pytest.approx(100.0, abs=1e-4)
    # two-pass artifacts written for compatibility
    assert os.path.exists(tmp_path / "hungarian_matching/instance_mapping.json")
    assert os.path.exists(tmp_path / "hungarian_matching/semantic_mapping.json")
