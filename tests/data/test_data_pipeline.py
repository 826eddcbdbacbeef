import json
import os

import numpy as np
import pytest

from u2seg_tpu.config.config import Config
from u2seg_tpu.data import transforms as T
from u2seg_tpu.data.loader import (
    InferenceSampler,
    RepeatFactorTrainingSampler,
    TrainingSampler,
    build_detection_train_loader,
    filter_images_with_only_crowd_annotations,
)
from u2seg_tpu.data.mapper import DatasetMapper
from u2seg_tpu.data.coco import load_coco_json


@pytest.fixture
def coco_dir(tmp_path, rng):
    """Tiny synthetic COCO dataset on disk."""
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    for i in range(6):
        h, w = int(rng.randint(60, 120)), int(rng.randint(60, 120))
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"img{i}.jpg"
        cv2.imwrite(str(img_dir / fname), img)
        images.append({"id": i, "file_name": fname, "height": h, "width": w})
        for _ in range(3):
            x, y = rng.randint(0, w // 2), rng.randint(0, h // 2)
            bw, bh = rng.randint(8, w // 2), rng.randint(8, h // 2)
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.choice([1, 5, 9])),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[
                    float(x), float(y), float(x + bw), float(y),
                    float(x + bw), float(y + bh), float(x), float(y + bh),
                ]],
            })
            aid += 1
    ds = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in [1, 5, 9]],
    }
    json_path = tmp_path / "instances.json"
    json_path.write_text(json.dumps(ds))
    return str(json_path), str(img_dir)


def test_load_coco_json(coco_dir):
    json_path, img_dir = coco_dir
    dicts = load_coco_json(json_path, img_dir, "test_ds_load")
    assert len(dicts) == 6
    d = dicts[0]
    assert os.path.exists(d["file_name"])
    assert len(d["annotations"]) == 3
    # contiguous remapping: cats {1,5,9} -> {0,1,2}
    cids = {a["category_id"] for dd in dicts for a in dd["annotations"]}
    assert cids <= {0, 1, 2}


def small_cfg():
    cfg = Config()
    cfg.model.max_gt_instances = 8
    cfg.input.pad_buckets = ((128, 128), (160, 128))
    cfg.input.min_size_train = (64, 96)
    cfg.input.max_size_train = 128
    return cfg


def test_mapper_fixed_shapes(coco_dir, rng):
    json_path, img_dir = coco_dir
    dicts = load_coco_json(json_path, img_dir)
    mapper = DatasetMapper(small_cfg(), is_train=True, mask_patch_size=32)
    ex = mapper(dicts[0], rng)
    assert ex["image"].shape[2] == 3
    assert ex["image"].shape[:2] in {(128, 128), (160, 128)}
    assert ex["gt_boxes"].shape == (8, 4)
    assert ex["gt_masks"].shape == (8, 32, 32)
    h, w = ex["image_size"]
    assert h <= ex["image"].shape[0] and w <= ex["image"].shape[1]
    # valid boxes are inside the image region
    vb = ex["gt_boxes"][ex["gt_valid"]]
    assert (vb[:, 2] <= w + 1e-3).all() and (vb[:, 3] <= h + 1e-3).all()
    assert (vb[:, 2] > vb[:, 0]).all()
    # mask patches for valid instances contain foreground
    assert ex["gt_masks"][ex["gt_valid"]].max() > 0.5


def test_train_loader_batches(coco_dir):
    json_path, img_dir = coco_dir
    dicts = load_coco_json(json_path, img_dir)
    mapper = DatasetMapper(small_cfg(), is_train=True, mask_patch_size=32)
    loader = build_detection_train_loader(
        dicts, mapper, total_batch_size=2, num_workers=2
    )
    batches = [next(loader) for _ in range(4)]
    for b in batches:
        assert b["image"].shape[0] == 2
        # same-bucket grouping: all images in a batch share the padded shape
        assert b["image"].shape[1:3] in {(128, 128), (160, 128)}
        assert b["gt_boxes"].shape == (2, 8, 4)


def test_training_sampler_sharding():
    s0 = TrainingSampler(10, seed=1, rank=0, world_size=2)
    s1 = TrainingSampler(10, seed=1, rank=1, world_size=2)
    a = list(zip(range(10), s0))
    b = list(zip(range(10), s1))
    ia = [x[1] for x in a]
    ib = [x[1] for x in b]
    assert set(ia[:5]) | set(ib[:5]) == set(range(10))
    assert set(ia[:5]) & set(ib[:5]) == set()


def test_inference_sampler_partition():
    # distributed logic tested functionally (ref tests/data/test_sampler.py)
    for world in [1, 2, 3, 4, 5]:
        shards = [list(InferenceSampler(11, r, world)) for r in range(world)]
        flat = [i for s in shards for i in s]
        assert flat == list(range(11))
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1


def test_repeat_factor_sampler_oversamples_rare():
    dicts = (
        [{"annotations": [{"category_id": 0}]}] * 95
        + [{"annotations": [{"category_id": 1}]}] * 5
    )
    s = RepeatFactorTrainingSampler(dicts, repeat_thresh=0.5, seed=0)
    first = [i for _, i in zip(range(2000), s)]
    rare = sum(1 for i in first if i >= 95)
    # rare category repeated ~sqrt(.5/.05)≈3.2x: share should far exceed 5%
    assert rare / len(first) > 0.10


def test_filter_crowd_only():
    dicts = [
        {"annotations": [{"iscrowd": 1}]},
        {"annotations": [{"iscrowd": 0}]},
        {"annotations": []},
    ]
    out = filter_images_with_only_crowd_annotations(dicts)
    assert len(out) == 1


def test_resize_shortest_edge_shapes():
    out = T.ResizeShortestEdge.get_output_shape(480, 640, 800, 1333)
    assert out == (800, 1067)
    out = T.ResizeShortestEdge.get_output_shape(480, 1280, 800, 1333)
    # cap at max_size 1333
    assert out[1] == 1333


def test_flip_boxes_consistent(rng):
    img = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    t = T.HFlipTransform(60)
    box = np.array([[10.0, 5.0, 20.0, 15.0]])
    fb = t.apply_box(box)[0]
    np.testing.assert_allclose(fb, [40, 5, 50, 15])
    # flipping twice is identity
    np.testing.assert_allclose(t.apply_box(t.apply_box(box)), box)
