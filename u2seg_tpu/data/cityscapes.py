"""Cityscapes dataset loading (instance + semantic).

Counterpart of ``detectron2/data/datasets/cityscapes.py`` and
``cityscapes_panoptic.py``: pairs leftImg8bit images with gtFine annotation
files; instance masks come from the *_instanceIds.png encoding
(id = class_id * 1000 + instance for things).
"""
from __future__ import annotations

import glob
import json
import logging
import os
from typing import List, Tuple

import numpy as np

from u2seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)

# (name, train_id) of the 8 thing classes / 19 trainId classes
CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]
CITYSCAPES_SEM_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
]
# labelId -> class index among things (from the cityscapes label table)
_THING_LABEL_IDS = {24: 0, 25: 1, 26: 2, 27: 3, 28: 4, 31: 5, 32: 6, 33: 7}


def _find_files(image_dir: str, gt_dir: str) -> List[Tuple[str, str, str]]:
    files = []
    for image_file in sorted(
        glob.glob(os.path.join(image_dir, "**", "*_leftImg8bit.png"),
                  recursive=True)
    ):
        suffix = "_leftImg8bit.png"
        prefix = os.path.relpath(image_file, image_dir)[: -len(suffix)]
        instance_file = os.path.join(gt_dir, prefix + "_gtFine_instanceIds.png")
        label_file = os.path.join(gt_dir, prefix + "_gtFine_labelIds.png")
        files.append((image_file, instance_file, label_file))
    return files


def load_cityscapes_instances(image_dir: str, gt_dir: str) -> List[dict]:
    """Instance segmentation dicts; masks decoded lazily from instanceIds
    pngs by the mapper (stored as file refs + precomputed boxes here)."""
    from PIL import Image

    out = []
    for idx, (img_f, inst_f, _) in enumerate(_find_files(image_dir, gt_dir)):
        if not os.path.exists(inst_f):
            continue
        with Image.open(inst_f) as im:
            inst = np.asarray(im)
        h, w = inst.shape
        anns = []
        for iid in np.unique(inst):
            if iid < 1000:
                # stuff, or a GROUP region of a thing class (e.g. a crowd
                # of cars labeled jointly): group regions are ignore
                # regions for the official instance protocol
                if iid in _THING_LABEL_IDS:
                    gmask = inst == iid
                    from u2seg_tpu.evaluation import rle as rle_codec

                    # tight bbox of the group region, not the full image:
                    # COCOeval's crowd-IoU in the bbox fallback path is
                    # intersection/detection-area, so a full-image crowd
                    # box would ignore every unmatched detection of this
                    # class instead of counting it as a false positive
                    gys, gxs = np.nonzero(gmask)
                    gx0, gy0 = float(gxs.min()), float(gys.min())
                    anns.append({
                        "category_id": _THING_LABEL_IDS[int(iid)],
                        "bbox": [gx0, gy0,
                                 float(gxs.max() + 1 - gx0),
                                 float(gys.max() + 1 - gy0)],
                        "area": int(gmask.sum()),
                        "iscrowd": 1,
                        "segmentation": rle_codec.encode(
                            gmask.astype(np.uint8)),
                    })
                continue
            label_id = iid // 1000
            if label_id not in _THING_LABEL_IDS:
                continue
            mask = inst == iid
            ys, xs = np.nonzero(mask)
            if len(xs) == 0:
                continue
            x0, y0 = float(xs.min()), float(ys.min())
            bw = float(xs.max() + 1 - x0)
            bh = float(ys.max() + 1 - y0)
            from u2seg_tpu.evaluation import rle as rle_codec

            anns.append({
                "category_id": _THING_LABEL_IDS[int(label_id)],
                "bbox": [x0, y0, bw, bh],
                "area": int(mask.sum()),
                "iscrowd": 0,
                "segmentation": rle_codec.encode(mask.astype(np.uint8)),
            })
        out.append({
            "file_name": img_f,
            "image_id": idx,
            "height": h,
            "width": w,
            "annotations": anns,
        })
    return out


def load_cityscapes_semantic(image_dir: str, gt_dir: str) -> List[dict]:
    out = []
    for idx, (img_f, _, label_f) in enumerate(_find_files(image_dir, gt_dir)):
        out.append({
            "file_name": img_f,
            "image_id": idx,
            "sem_seg_file_name": label_f,
        })
    return out


def register_cityscapes(root: str = "datasets/cityscapes"):
    for split in ("train", "val", "test"):
        image_dir = os.path.join(root, "leftImg8bit", split)
        gt_dir = os.path.join(root, "gtFine", split)
        inst_name = f"cityscapes_fine_instance_seg_{split}"
        if inst_name not in DatasetCatalog:
            DatasetCatalog.register(
                inst_name,
                lambda i=image_dir, g=gt_dir: load_cityscapes_instances(i, g),
            )
            MetadataCatalog.get(inst_name).set(
                thing_classes=CITYSCAPES_THING_CLASSES,
                evaluator_type="cityscapes_instance",
            )
        sem_name = f"cityscapes_fine_sem_seg_{split}"
        if sem_name not in DatasetCatalog:
            DatasetCatalog.register(
                sem_name,
                lambda i=image_dir, g=gt_dir: load_cityscapes_semantic(i, g),
            )
            MetadataCatalog.get(sem_name).set(
                stuff_classes=CITYSCAPES_SEM_CLASSES,
                evaluator_type="cityscapes_sem_seg",
                ignore_label=255,
            )
