#!/usr/bin/env python
"""Panoptic segmentation demo on images / video / webcam.

Counterpart of the reference ``demo/u2seg_demo.py`` (setup_cfg :23,
--hungarian_matching flag :48, per-image predict+visualize loop :102-140)
and ``demo/predictor.py`` (VisualizationDemo :15).

Usage:
  python demo/u2seg_demo.py --config-file configs/.../u2seg_R50_800.yaml \
      --input img1.jpg img2.jpg --output out_dir \
      [--hungarian-matching-dir ./hungarian_matching]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_parser():
    parser = argparse.ArgumentParser(description="u2seg_tpu demo")
    parser.add_argument(
        "--config-file",
        default="configs/COCO-PanopticSegmentation/u2seg_R50_800.yaml",
    )
    parser.add_argument("--input", nargs="+", help="input images (globs ok)")
    parser.add_argument("--video-input", help="video file")
    parser.add_argument("--webcam", action="store_true")
    parser.add_argument("--output", help="output dir or file")
    parser.add_argument(
        "--confidence-threshold", type=float, default=0.5,
        help="instance score threshold for visualization",
    )
    parser.add_argument(
        "--hungarian-matching-dir", default="",
        help="dir with instance/semantic mapping jsons: remap cluster ids "
             "to real categories before visualization",
    )
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser


class VisualizationDemo:
    """ref demo/predictor.py:15."""

    def __init__(self, cfg, matching_dir: str = ""):
        from u2seg_tpu.engine.predictor import DefaultPredictor
        from u2seg_tpu.data.catalog import MetadataCatalog

        self.predictor = DefaultPredictor(cfg)
        self.metadata = MetadataCatalog.get("__demo__")
        self.instance_mapping = None
        if matching_dir:
            from u2seg_tpu.evaluation import hungarian

            self.instance_mapping = hungarian.load_mapping(
                os.path.join(matching_dir, "instance_mapping.json")
            )

    def run_on_image(self, img_rgb: np.ndarray):
        from u2seg_tpu.utils.visualizer import Visualizer

        predictions = self.predictor(img_rgb)
        vis = Visualizer(img_rgb, self.metadata)
        if "panoptic" in predictions:
            segments = predictions["segments"]
            if self.instance_mapping is not None:
                segments = [
                    dict(s, category_id=self.instance_mapping.get(
                        s["category_id"], s["category_id"]))
                    for s in segments
                ]
            out = vis.draw_panoptic_seg(predictions["panoptic"], segments)
        else:
            out = vis.draw_instance_predictions(predictions["instances"])
        return predictions, out


def main():
    import cv2

    from u2seg_tpu.config.config import load_config

    args = get_parser().parse_args()
    cfg = load_config(args.config_file or None,
                      [o for o in args.opts if "=" in o])
    demo = VisualizationDemo(cfg, args.hungarian_matching_dir)

    if args.input:
        paths = []
        for pat in args.input:
            paths.extend(sorted(glob.glob(pat)) or [pat])
        if args.output:
            os.makedirs(args.output, exist_ok=True)
        for path in paths:
            img = cv2.imread(path)[:, :, ::-1]  # BGR -> RGB
            t0 = time.perf_counter()
            predictions, vis = demo.run_on_image(img)
            n_inst = len(predictions["instances"]["scores"])
            print(f"{path}: {n_inst} instances in "
                  f"{time.perf_counter() - t0:.2f}s")
            if args.output:
                out_path = os.path.join(args.output, os.path.basename(path))
                cv2.imwrite(out_path, vis[:, :, ::-1])
    elif args.video_input or args.webcam:
        from u2seg_tpu.utils.tracking import BBoxIOUTracker
        from u2seg_tpu.utils.visualizer import VideoVisualizer

        cam = cv2.VideoCapture(0 if args.webcam else args.video_input)
        tracker = BBoxIOUTracker()
        vvis = VideoVisualizer()
        writer = None
        while cam.isOpened():
            ok, frame = cam.read()
            if not ok:
                break
            rgb = frame[:, :, ::-1]
            predictions, _ = demo.run_on_image(rgb)
            inst = predictions["instances"]
            ids = tracker.update(inst)
            vis = vvis.draw_instance_predictions(rgb, inst, ids)
            if args.output:
                if writer is None:
                    h, w = vis.shape[:2]
                    writer = cv2.VideoWriter(
                        args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                        25.0, (w, h),
                    )
                writer.write(vis[:, :, ::-1])
        cam.release()
        if writer is not None:
            writer.release()


if __name__ == "__main__":
    main()
