#!/usr/bin/env python
"""Visualize COCO-format prediction json files against their images.

Counterpart of the reference ``tools/visualize_json_results.py``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import cv2
    import numpy as np

    from u2seg_tpu.data.mapper import read_image
    from u2seg_tpu.evaluation import rle as rle_codec
    from u2seg_tpu.evaluation.coco_api import COCO
    from u2seg_tpu.utils.visualizer import Visualizer

    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="prediction json")
    parser.add_argument("--dataset-json", required=True, help="GT coco json")
    parser.add_argument("--image-root", required=True)
    parser.add_argument("--output", default="./vis_results")
    parser.add_argument("--conf-threshold", type=float, default=0.5)
    parser.add_argument("--max-images", type=int, default=50)
    args = parser.parse_args()

    with open(args.input) as f:
        predictions = json.load(f)
    coco = COCO(args.dataset_json)
    by_image = defaultdict(list)
    for p in predictions:
        if p["score"] >= args.conf_threshold:
            by_image[p["image_id"]].append(p)

    os.makedirs(args.output, exist_ok=True)
    for i, (img_id, preds) in enumerate(sorted(by_image.items())):
        if i >= args.max_images:
            break
        info = coco.imgs[img_id]
        path = os.path.join(args.image_root, info["file_name"])
        img = read_image(path, "RGB")
        boxes, scores, classes, masks = [], [], [], []
        for p in preds:
            x, y, w, h = p["bbox"]
            boxes.append([x, y, x + w, y + h])
            scores.append(p["score"])
            classes.append(p["category_id"])
            if "segmentation" in p:
                masks.append(rle_codec.decode(p["segmentation"]))
        inst = {
            "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
            "scores": np.asarray(scores),
            "classes": np.asarray(classes, np.int64),
        }
        if masks:
            inst["masks"] = masks
        vis = Visualizer(img).draw_instance_predictions(inst)
        out = os.path.join(args.output, info["file_name"].replace("/", "_"))
        cv2.imwrite(out, vis[:, :, ::-1])
        print("wrote", out)


if __name__ == "__main__":
    main()
