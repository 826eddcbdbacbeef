"""Visualization of instances / semantic / panoptic predictions.

Counterpart of ``detectron2/utils/visualizer.py:331`` (Visualizer:
draw_instance_predictions, draw_sem_seg, draw_panoptic_seg, draw_dataset_
dict) and ``colormap.py``. Implemented on top of cv2/numpy (no matplotlib
dependency in the hot path).
"""
from __future__ import annotations

import colorsys
from typing import Dict, List, Optional, Sequence

import numpy as np


def colormap(n: int, rgb: bool = True, bright: bool = True) -> np.ndarray:
    """Deterministic distinct colors, shape (n, 3) uint8."""
    out = np.zeros((n, 3), np.uint8)
    for i in range(n):
        h = (i * 0.61803398875) % 1.0
        s = 0.75 if bright else 0.5
        v = 0.95 if bright else 0.7
        r, g, b = colorsys.hsv_to_rgb(h, s, v)
        out[i] = [int(r * 255), int(g * 255), int(b * 255)]
    return out


class Visualizer:
    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0):
        self.img = np.asarray(img_rgb).astype(np.uint8).copy()
        self.metadata = metadata
        self.h, self.w = self.img.shape[:2]
        self._colors = colormap(256)

    # -- helpers -----------------------------------------------------
    def _class_name(self, cid: int) -> str:
        names = getattr(self.metadata, "thing_classes", None) if self.metadata else None
        if names and 0 <= cid < len(names):
            return str(names[cid])
        return str(cid)

    def _stuff_name(self, cid: int) -> str:
        names = getattr(self.metadata, "stuff_classes", None) if self.metadata else None
        if names and 0 <= cid < len(names):
            return str(names[cid])
        return str(cid)

    def _blend_mask(self, mask: np.ndarray, color: np.ndarray, alpha: float = 0.5):
        m = mask.astype(bool)
        self.img[m] = (
            self.img[m].astype(np.float32) * (1 - alpha)
            + color.astype(np.float32) * alpha
        ).astype(np.uint8)

    def _draw_box(self, box, color):
        import cv2

        x0, y0, x1, y1 = [int(v) for v in box]
        cv2.rectangle(self.img, (x0, y0), (x1, y1), color.tolist(), 2)

    def _draw_text(self, text, pos, color=(255, 255, 255)):
        import cv2

        x, y = int(pos[0]), int(pos[1])
        cv2.putText(
            self.img, text, (x, max(y, 10)), cv2.FONT_HERSHEY_SIMPLEX,
            0.5, color, 1, cv2.LINE_AA,
        )

    # -- public ------------------------------------------------------
    def draw_instance_predictions(self, instances: dict) -> np.ndarray:
        """instances: {"boxes" (K,4 XYXY), "scores", "classes",
        "masks" optional list of (H,W)}."""
        boxes = np.asarray(instances.get("boxes", np.zeros((0, 4))))
        scores = np.asarray(instances.get("scores", np.zeros(len(boxes))))
        classes = np.asarray(
            instances.get("classes", np.zeros(len(boxes), np.int64))
        )
        masks = instances.get("masks")
        keypoints = instances.get("keypoints")
        for i in range(len(boxes)):
            color = self._colors[int(classes[i]) % 256]
            if masks is not None:
                self._blend_mask(np.asarray(masks[i]), color)
            self._draw_box(boxes[i], color)
            if keypoints is not None:
                self.draw_keypoints(np.asarray(keypoints[i]))
            self._draw_text(
                f"{self._class_name(int(classes[i]))} {scores[i]:.0%}",
                (boxes[i][0], boxes[i][1] - 4),
            )
        return self.img

    # COCO person skeleton (public keypoint_connection_rules, ref
    # builtin_meta.py:225 — index pairs into COCO_PERSON_KEYPOINT_NAMES)
    _SKELETON = (
        (1, 2), (0, 1), (0, 2), (1, 3), (2, 4),       # face
        (5, 7), (7, 9), (6, 8), (8, 10), (5, 6),      # arms + shoulders
        (11, 13), (13, 15), (12, 14), (14, 16), (11, 12),  # legs + hips
        (5, 11), (6, 12),                             # torso
    )

    def draw_keypoints(self, kp: np.ndarray,
                       threshold: float = 0.05) -> np.ndarray:
        """Draw a (K, 3) keypoint set with the COCO person skeleton
        (ref visualizer.py draw_and_connect_keypoints): dots for visible
        points, limb segments where both endpoints are visible."""
        import cv2

        vis = kp[:, 2] > threshold
        for k in range(len(kp)):
            if vis[k]:
                cv2.circle(self.img, (int(kp[k, 0]), int(kp[k, 1])),
                           3, (255, 64, 64), -1)
        if len(kp) == 17:
            for a, b in self._SKELETON:
                if vis[a] and vis[b]:
                    cv2.line(self.img,
                             (int(kp[a, 0]), int(kp[a, 1])),
                             (int(kp[b, 0]), int(kp[b, 1])),
                             (64, 255, 64), 1)
        return self.img

    def draw_sem_seg(self, sem_seg: np.ndarray, alpha: float = 0.6) -> np.ndarray:
        sem = np.asarray(sem_seg)
        for label in np.unique(sem):
            if label == 255:
                continue
            self._blend_mask(sem == label, self._colors[int(label) % 256], alpha)
        return self.img

    def draw_panoptic_seg(
        self, panoptic: np.ndarray, segments: Sequence[dict], alpha: float = 0.6
    ) -> np.ndarray:
        pan = np.asarray(panoptic)
        for seg in segments:
            mask = pan == seg["id"]
            if not mask.any():
                continue
            color = self._colors[int(seg["category_id"]) % 256]
            self._blend_mask(mask, color, alpha)
            ys, xs = np.nonzero(mask)
            name = (
                self._class_name(seg["category_id"])
                if seg.get("isthing") else self._stuff_name(seg["category_id"])
            )
            self._draw_text(name, (xs.mean(), ys.mean()))
        return self.img

    def draw_dataset_dict(self, d: dict) -> np.ndarray:
        anns = d.get("annotations", [])
        boxes = []
        classes = []
        for a in anns:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            classes.append(a["category_id"])
        return self.draw_instance_predictions(
            {"boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
             "scores": np.ones(len(boxes)),
             "classes": np.asarray(classes, np.int64)}
        )


class VideoVisualizer:
    """Tracking-color-consistent video visualization
    (ref video_visualizer.py:41): instance colors follow track ids."""

    def __init__(self, metadata=None):
        self.metadata = metadata
        self._colors = colormap(1024)

    def draw_instance_predictions(self, frame_rgb, instances: dict,
                                  track_ids: Optional[np.ndarray] = None):
        vis = Visualizer(frame_rgb, self.metadata)
        boxes = np.asarray(instances.get("boxes", np.zeros((0, 4))))
        classes = np.asarray(instances.get("classes", np.zeros(len(boxes))))
        scores = np.asarray(instances.get("scores", np.ones(len(boxes))))
        masks = instances.get("masks")
        for i in range(len(boxes)):
            key = int(track_ids[i]) if track_ids is not None else int(classes[i])
            color = self._colors[key % 1024]
            if masks is not None:
                vis._blend_mask(np.asarray(masks[i]), color)
            vis._draw_box(boxes[i], color)
            vis._draw_text(
                f"{vis._class_name(int(classes[i]))} {scores[i]:.0%}"
                + (f" #{key}" if track_ids is not None else ""),
                (boxes[i][0], boxes[i][1] - 4),
            )
        return vis.img
