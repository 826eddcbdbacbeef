"""Pseudo-annotation assembly: cluster-labeled instances + STEGO semantics
-> COCO-panoptic training annotations.

Counterpart of ``datasets/prepare_ours/`` in the reference:
  - ``generate_classaware_instanceseg_annotations.py`` (cluster ids onto
    class-agnostic CutLER masks, :52)
  - ``generate_pseudo_panoptic.py`` (area-desc instance paste :102-110,
    drop fully-overwritten :112-119, STEGO stuff fill with >0.7-overlap
    skip :123-143, id2rgb PNGs :147-153)
  - ``get_panoptic_anns_supercategory.py`` (GT val stuff 53 -> 15
    supercategories at ids cluster_num+1..+15)
  - ``prepare_stuff_panoptic_fpn.py`` (panoptic PNG -> semantic PNG:
    things->0, stuff->contiguous, ignore->255)
"""
from __future__ import annotations

import copy
import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from u2seg_tpu.data.builtin_meta import STUFF_TO_SUPERCATEGORY, create_cate
from u2seg_tpu.evaluation import rle as rle_codec

logger = logging.getLogger(__name__)


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    """Segment id -> RGB encoding (panopticapi convention, little-endian)."""
    out = np.zeros(id_map.shape + (3,), np.uint8)
    out[..., 0] = id_map % 256
    out[..., 1] = (id_map // 256) % 256
    out[..., 2] = id_map // (256 * 256)
    return out


def rgb2id(rgb: np.ndarray) -> np.ndarray:
    rgb = rgb.astype(np.int64)
    return rgb[..., 0] + rgb[..., 1] * 256 + rgb[..., 2] * 256 * 256


def assign_cluster_ids(
    class_agnostic_json: dict,
    cluster_decode: Dict[str, int],
    cluster_num: int,
) -> dict:
    """Class-agnostic instance json + {instance_key: cluster_id} decode map
    -> class-aware instance json (category_id = cluster_id + 1, synthetic
    categories 1..N+27). Instance keys follow the reference convention
    "{image_id}_{ann_id}" (generate_classaware... :52)."""
    out = copy.deepcopy(class_agnostic_json)
    out["categories"] = create_cate(cluster_num)
    kept = []
    for ann in out.get("annotations", []):
        key = f"{ann['image_id']}_{ann['id']}"
        if key not in cluster_decode:
            continue
        ann["category_id"] = int(cluster_decode[key]) + 1
        kept.append(ann)
    out["annotations"] = kept
    return out


def merge_instances_and_stego(
    instances: Sequence[dict],            # anns of ONE image (cluster cat ids)
    stego_map: np.ndarray,                # (H, W) int 0..26 STEGO labels
    cluster_num: int,
    hw: Tuple[int, int],
    overlap_skip: float = 0.7,
    decode_fn=None,
) -> Tuple[np.ndarray, List[dict]]:
    """One image's pseudo panoptic map + segments_info.

    Semantics of generate_pseudo_panoptic.py:
      - paste instance masks in DESCENDING area order (big first, so small
        instances overwrite big ones, :102-110);
      - drop instances whose pixels were fully overwritten (:112-119);
      - each STEGO label becomes a stuff segment with category
        cluster_num + 1 + label, unless instances cover > 0.7 of it
        (:123-143).
    """
    h, w = hw
    decode_fn = decode_fn or (lambda ann: rle_codec.decode(ann["segmentation"]))
    pan = np.zeros((h, w), np.int64)
    next_id = 1
    segs: List[dict] = []

    anns = sorted(instances, key=lambda a: -a.get("area", 0))
    ids = []
    for ann in anns:
        mask = decode_fn(ann).astype(bool)
        sid = next_id
        next_id += 1
        pan[mask] = sid
        ids.append((sid, ann))
    # drop fully-overwritten instances
    remaining = set(np.unique(pan).tolist())
    for sid, ann in ids:
        if sid not in remaining:
            continue
        area = int(np.sum(pan == sid))
        segs.append({
            "id": sid,
            "category_id": int(ann["category_id"]),
            "isthing": 1,
            "area": area,
            "iscrowd": 0,
        })

    claimed = pan > 0
    stego = np.asarray(stego_map)
    for label in np.unique(stego):
        region = stego == label
        total = int(region.sum())
        if total == 0:
            continue
        covered = int((region & claimed).sum())
        if covered / total > overlap_skip:
            continue
        free = region & ~claimed
        if not free.any():
            continue
        sid = next_id
        next_id += 1
        pan[free] = sid
        segs.append({
            "id": sid,
            "category_id": int(cluster_num + 1 + label),
            "isthing": 0,
            "area": int(free.sum()),
            "iscrowd": 0,
        })
    return pan, segs


def panoptic_to_semantic(
    pan: np.ndarray,
    segments: Sequence[dict],
    thing_to_zero: bool = True,
    stuff_base: Optional[int] = None,
) -> np.ndarray:
    """Panoptic id map -> per-pixel semantic training PNG for PanopticFPN:
    things -> 0, stuff category c -> contiguous index, unlabeled -> 255
    (prepare_stuff_panoptic_fpn.py:30-70)."""
    out = np.full(pan.shape, 255, np.uint8)
    stuff_cats = sorted({
        s["category_id"] for s in segments if not s.get("isthing", 1)
    }) if stuff_base is None else None
    for s in segments:
        mask = pan == s["id"]
        if s.get("isthing", 1):
            out[mask] = 0
        else:
            if stuff_base is not None:
                out[mask] = s["category_id"] - stuff_base
            else:
                out[mask] = stuff_cats.index(s["category_id"]) + 1
    return out


def gt_panoptic_to_supercategories(
    panoptic_json: dict, cluster_num: int
) -> dict:
    """GT COCO panoptic val json: 53 stuff categories -> 15 supercategories
    shifted to ids cluster_num+1..+15; things unchanged
    (get_panoptic_anns_supercategory.py:8-27). Produces the
    ``panoptic_val2017_{N}super.json`` eval GT."""
    out = copy.deepcopy(panoptic_json)
    for ann in out.get("annotations", []):
        for seg in ann.get("segments_info", []):
            cid = seg["category_id"]
            if cid in STUFF_TO_SUPERCATEGORY:
                seg["category_id"] = cluster_num + STUFF_TO_SUPERCATEGORY[cid]
    new_cats = []
    seen = set()
    for cat in out.get("categories", []):
        cid = cat["id"]
        if cid in STUFF_TO_SUPERCATEGORY:
            sup = cluster_num + STUFF_TO_SUPERCATEGORY[cid]
            if sup not in seen:
                seen.add(sup)
                new_cats.append({
                    "id": sup, "name": f"super_{STUFF_TO_SUPERCATEGORY[cid]}",
                    "isthing": 0, "supercategory": cat.get("supercategory", ""),
                })
        else:
            new_cats.append(cat)
    out["categories"] = new_cats
    return out


def write_panoptic_png(pan: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(id2rgb(pan)).save(path)


def read_panoptic_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        return rgb2id(np.asarray(img.convert("RGB")))
