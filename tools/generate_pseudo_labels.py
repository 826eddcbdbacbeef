#!/usr/bin/env python
"""Pseudo-label generation driver: DINO features -> clustering -> COCO jsons.

Counterpart of the reference pipeline (SURVEY.md §3.4):
  u2seg/Instance_Clustering/selective_labeling/usl-imagenet.py  (stage 1)
  datasets/prepare_ours/generate_classaware_instanceseg_annotations.py (2)
  datasets/prepare_ours/generate_pseudo_panoptic.py             (stage 3)
  datasets/prepare_ours/prepare_stuff_panoptic_fpn.py           (stage 4)
  datasets/prepare_ours/get_panoptic_anns_supercategory.py      (stage 5)

Stages (select with --stage; "all" runs 1-4):
  1 cluster:   embed masked instance crops with DINO ViT-B/16, kNN density +
               k-means(++) on device, write cluster_labels_decode.json
  2 assign:    cluster ids onto the class-agnostic instance json
  3 panoptic:  merge cluster instances + STEGO maps into panoptic pngs/json
  4 stuff:     panoptic pngs -> semantic training pngs
  5 supergt:   GT panoptic_val2017.json -> {N}super.json eval GT
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger("pseudo_labels")


def stage_cluster(args):
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.engine.checkpoint import load_reference_state_dict
    from u2seg_tpu.pseudo.dino import (
        DinoViT, IMAGENET_MEAN, IMAGENET_STD, convert_dino_vit,
        masked_crop_features,
    )
    from u2seg_tpu.pseudo.kmeans import density_from_knn, kmeans, knn
    from u2seg_tpu.data.mapper import read_image

    model = DinoViT(facet="k")
    grid = args.crop_size // 16
    if args.dino_weights:
        ref = load_reference_state_dict(args.dino_weights)
        params = convert_dino_vit(ref, grid_hw=(grid, grid))
    else:
        logger.warning("no --dino-weights: using random features (smoke mode)")
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, args.crop_size, args.crop_size, 3)),
        )["params"]

    # crops directory: one image file per masked instance, named by key
    files = sorted(os.listdir(args.crops_dir))
    feats = []
    keys = []
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    batch = []
    import cv2

    for f in files:
        img = read_image(os.path.join(args.crops_dir, f), "RGB")
        img = cv2.resize(img, (args.crop_size, args.crop_size))
        batch.append((img.astype(np.float32) / 255.0 - mean) / std)
        keys.append(os.path.splitext(f)[0])
        if len(batch) == args.batch_size:
            feats.append(np.asarray(masked_crop_features(
                model, params, jnp.asarray(np.stack(batch))
            )))
            batch = []
    if batch:
        feats.append(np.asarray(masked_crop_features(
            model, params, jnp.asarray(np.stack(batch))
        )))
    feats = np.concatenate(feats) if feats else np.zeros((0, 768), np.float32)
    logger.info("embedded %d crops", len(feats))

    f = jnp.asarray(feats)
    dists, _ = knn(f, k=min(args.knn, max(len(feats) - 1, 1)))
    density = density_from_knn(dists)
    _, assignments = kmeans(
        jax.random.PRNGKey(args.seed), f, args.num_clusters,
        num_iters=args.kmeans_iters,
    )
    decode = {k: int(a) for k, a in zip(keys, np.asarray(assignments))}
    os.makedirs(os.path.dirname(args.decode_json) or ".", exist_ok=True)
    with open(args.decode_json, "w") as fp:
        json.dump(decode, fp)
    logger.info("wrote %s (%d entries)", args.decode_json, len(decode))

    if args.select_json and len(feats):
        # USL regularized representative selection (ref usl-imagenet.py
        # :139-153 with the ImageNet_usl_dino_0.2.yaml REG settings)
        from u2seg_tpu.pseudo.kmeans import (
            select_representatives_regularized,
        )

        nd = np.asarray(density_from_knn(dists), np.float64)
        sel = select_representatives_regularized(
            feats, np.asarray(assignments), np.maximum(nd, 1e-12),
            args.num_clusters, iters=args.reg_iters, w=args.reg_w,
            momentum=args.reg_momentum, horizon_num=args.reg_horizon,
            exclude_same_cluster=True,
        )
        with open(args.select_json, "w") as fp:
            json.dump({"selected_keys": [keys[i] for i in sel],
                       "selected_indices": sel.tolist()}, fp)
        logger.info("wrote %s (%d selected)", args.select_json, len(sel))


def stage_assign(args):
    from u2seg_tpu.pseudo.assembly import assign_cluster_ids

    with open(args.instances_json) as f:
        src = json.load(f)
    with open(args.decode_json) as f:
        decode = json.load(f)
    out = assign_cluster_ids(src, decode, args.num_clusters)
    with open(args.output_json, "w") as f:
        json.dump(out, f)
    logger.info("wrote %s (%d anns)", args.output_json, len(out["annotations"]))


def stage_panoptic(args):
    from collections import defaultdict

    from u2seg_tpu.data.builtin_meta import create_cate
    from u2seg_tpu.pseudo.assembly import (
        merge_instances_and_stego, write_panoptic_png,
    )

    with open(args.output_json) as f:
        inst = json.load(f)
    by_image = defaultdict(list)
    for ann in inst["annotations"]:
        by_image[ann["image_id"]].append(ann)
    os.makedirs(args.panoptic_dir, exist_ok=True)
    pan_anns = []
    for img in inst["images"]:
        stego_path = os.path.join(
            args.stego_dir, os.path.splitext(img["file_name"])[0] + ".npy"
        )
        hw = (img["height"], img["width"])
        stego = (
            np.load(stego_path) if os.path.exists(stego_path)
            else np.zeros(hw, np.int64)
        )
        pan, segs = merge_instances_and_stego(
            by_image.get(img["id"], []), stego, args.num_clusters, hw
        )
        png = os.path.splitext(img["file_name"])[0] + ".png"
        write_panoptic_png(pan, os.path.join(args.panoptic_dir, png))
        pan_anns.append({
            "image_id": img["id"], "file_name": png, "segments_info": segs,
        })
    out = {
        "images": inst["images"],
        "annotations": pan_anns,
        "categories": create_cate(args.num_clusters),
    }
    with open(args.panoptic_json, "w") as f:
        json.dump(out, f)
    logger.info("wrote %s + %d pngs", args.panoptic_json, len(pan_anns))


def stage_stuff(args):
    from PIL import Image

    from u2seg_tpu.pseudo.assembly import panoptic_to_semantic, read_panoptic_png

    with open(args.panoptic_json) as f:
        pj = json.load(f)
    os.makedirs(args.stuff_dir, exist_ok=True)
    for ann in pj["annotations"]:
        pan = read_panoptic_png(os.path.join(args.panoptic_dir, ann["file_name"]))
        sem = panoptic_to_semantic(
            pan, ann["segments_info"], stuff_base=args.num_clusters
        )
        Image.fromarray(sem).save(os.path.join(args.stuff_dir, ann["file_name"]))
    logger.info("wrote %d stuff pngs", len(pj["annotations"]))


def stage_supergt(args):
    from u2seg_tpu.pseudo.assembly import gt_panoptic_to_supercategories

    with open(args.gt_panoptic_json) as f:
        pj = json.load(f)
    out = gt_panoptic_to_supercategories(pj, args.num_clusters)
    with open(args.super_json, "w") as f:
        json.dump(out, f)
    logger.info("wrote %s", args.super_json)


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="all",
                   choices=["all", "cluster", "assign", "panoptic", "stuff",
                            "supergt"])
    p.add_argument("--num-clusters", type=int, default=800)
    p.add_argument("--seed", type=int, default=0)
    # stage 1
    p.add_argument("--crops-dir", default="datasets/cutler_crops")
    p.add_argument("--dino-weights", default="")
    p.add_argument("--crop-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--knn", type=int, default=20)
    p.add_argument("--kmeans-iters", type=int, default=100)
    p.add_argument("--decode-json", default="cluster_labels_decode.json")
    p.add_argument("--select-json", default="",
                   help="optional USL selected-representatives output")
    p.add_argument("--reg-iters", type=int, default=2)
    p.add_argument("--reg-w", type=float, default=0.05)
    p.add_argument("--reg-momentum", type=float, default=0.0)
    p.add_argument("--reg-horizon", type=int, default=32)
    # stage 2
    p.add_argument("--instances-json", default="datasets/cutler_instances.json")
    p.add_argument("--output-json", default="cluster_curated.json")
    # stage 3
    p.add_argument("--stego-dir", default="datasets/stego_maps")
    p.add_argument("--panoptic-dir", default="panoptic_ours")
    p.add_argument("--panoptic-json", default="panoptic_coco.json")
    # stage 4
    p.add_argument("--stuff-dir", default="panoptic_stuff_ours")
    # stage 5
    p.add_argument("--gt-panoptic-json",
                   default="datasets/coco/annotations/panoptic_val2017.json")
    p.add_argument("--super-json", default="panoptic_val2017_super.json")
    args = p.parse_args()

    stages = (["cluster", "assign", "panoptic", "stuff"]
              if args.stage == "all" else [args.stage])
    for s in stages:
        globals()[f"stage_{s}"](args)


if __name__ == "__main__":
    main()
