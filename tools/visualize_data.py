#!/usr/bin/env python
"""Visualize dataset ground truth / augmented training batches.

Counterpart of the reference ``tools/visualize_data.py``: renders either
raw dataset annotations ("annotation" source) or the mapper's augmented
output ("dataloader" source) to image files.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import cv2
    import numpy as np

    from u2seg_tpu.config.config import load_config
    from u2seg_tpu.data.builtin import register_all_coco
    from u2seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from u2seg_tpu.data.mapper import DatasetMapper, read_image
    from u2seg_tpu.utils.visualizer import Visualizer

    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--source", choices=["annotation", "dataloader"],
                        default="annotation")
    parser.add_argument("--dataset", default="")
    parser.add_argument("--output-dir", default="./vis")
    parser.add_argument("--max-images", type=int, default=20)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    cfg = load_config(args.config_file or None,
                      [o for o in args.opts if "=" in o])
    register_all_coco(cfg.datasets.root, cluster_num=cfg.datasets.cluster_num)
    name = args.dataset or cfg.datasets.train[0]
    dicts = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.source == "annotation":
        for d in dicts[: args.max_images]:
            img = read_image(d["file_name"], "RGB")
            vis = Visualizer(img, meta).draw_dataset_dict(d)
            out = os.path.join(
                args.output_dir, os.path.basename(d["file_name"])
            )
            cv2.imwrite(out, vis[:, :, ::-1])
            print("wrote", out)
    else:
        mapper = DatasetMapper(cfg, is_train=True)
        rng = np.random.RandomState(0)
        for i, d in enumerate(dicts[: args.max_images]):
            ex = mapper(d, rng)
            if ex is None:
                continue
            h, w = ex["image_size"]
            img = ex["image"][:h, :w].astype(np.uint8)
            boxes = ex["gt_boxes"][ex["gt_valid"]]
            classes = ex["gt_classes"][ex["gt_valid"]]
            vis = Visualizer(img, meta).draw_instance_predictions({
                "boxes": boxes, "classes": classes,
                "scores": np.ones(len(boxes)),
            })
            out = os.path.join(args.output_dir, f"mapped_{i}.jpg")
            cv2.imwrite(out, vis[:, :, ::-1])
            print("wrote", out)


if __name__ == "__main__":
    main()
