"""Host-side image transforms (numpy/cv2).

Counterpart of ``detectron2/data/transforms/`` (Augmentation/AugInput
augmentation.py:80,278; ResizeShortestEdge / RandomFlip / ResizeScale /
RandomCrop etc. augmentation_impl.py:48-736; geometric Transform wrappers
transform.py). The TPU build keeps transforms on the host and samples the
same multi-scale distribution; the device only ever sees bucket-padded
static shapes.

Each transform is a small object with apply_image / apply_box / apply_coords
/ apply_segmentation so box & mask geometry stays consistent with pixels.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


class Transform:
    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        """XYXY boxes via corner transform (axis-aligned transforms only)."""
        if len(boxes) == 0:
            return boxes
        corners = boxes.reshape(-1, 2)
        corners = self.apply_coords(corners.astype(np.float64))
        b = corners.reshape(-1, 4)
        x0 = np.minimum(b[:, 0], b[:, 2])
        x1 = np.maximum(b[:, 0], b[:, 2])
        y0 = np.minimum(b[:, 1], b[:, 3])
        y1 = np.maximum(b[:, 1], b[:, 3])
        return np.stack([x0, y0, x1, y1], axis=1)

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        return self.apply_image(seg)


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords


class ResizeTransform(Transform):
    """Bilinear image resize (nearest for segmentation), matching the
    reference's ResizeTransform (transform.py)."""

    def __init__(self, h: int, w: int, new_h: int, new_w: int):
        self.h, self.w, self.new_h, self.new_w = h, w, new_h, new_w

    def apply_image(self, img, interp=None):
        import cv2

        if (self.h, self.w) == (self.new_h, self.new_w):
            return img
        interp = interp if interp is not None else cv2.INTER_LINEAR
        return cv2.resize(img, (self.new_w, self.new_h), interpolation=interp)

    def apply_coords(self, coords):
        coords = coords.astype(np.float64).copy()
        coords[:, 0] *= self.new_w / self.w
        coords[:, 1] *= self.new_h / self.h
        return coords

    def apply_segmentation(self, seg):
        import cv2

        if (self.h, self.w) == (self.new_h, self.new_w):
            return seg
        return cv2.resize(
            seg, (self.new_w, self.new_h), interpolation=cv2.INTER_NEAREST
        )


class HFlipTransform(Transform):
    def __init__(self, width: int):
        self.width = width

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    def apply_coords(self, coords):
        coords = coords.astype(np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords


class TransformList(Transform):
    def __init__(self, tfms: Sequence[Transform]):
        self.tfms = list(tfms)

    def apply_image(self, img):
        for t in self.tfms:
            img = t.apply_image(img)
        return img

    def apply_coords(self, coords):
        for t in self.tfms:
            coords = t.apply_coords(coords)
        return coords

    def apply_box(self, boxes):
        for t in self.tfms:
            boxes = t.apply_box(boxes)
        return boxes

    def apply_segmentation(self, seg):
        for t in self.tfms:
            seg = t.apply_segmentation(seg)
        return seg


# ---------------------------------------------------------------------------
# Augmentations (sample a Transform from image + rng)
# ---------------------------------------------------------------------------

class Augmentation:
    def get_transform(self, image: np.ndarray, rng: np.random.RandomState) -> Transform:
        raise NotImplementedError


class ResizeShortestEdge(Augmentation):
    """Resize shortest edge to a sampled target, cap the longest edge
    (ref augmentation_impl.py ResizeShortestEdge; u2seg trains with
    choice-sampling from (240,...,1024), max 1333)."""

    def __init__(self, short_edge_length, max_size: int = 1333,
                 sample_style: str = "choice"):
        if isinstance(short_edge_length, int):
            short_edge_length = (short_edge_length,)
        self.short_edge_length = tuple(short_edge_length)
        self.max_size = max_size
        self.sample_style = sample_style

    @staticmethod
    def get_output_shape(h: int, w: int, size: int, max_size: int) -> Tuple[int, int]:
        scale = size / min(h, w)
        if h < w:
            new_h, new_w = size, scale * w
        else:
            new_h, new_w = scale * h, size
        if max(new_h, new_w) > max_size:
            s = max_size / max(new_h, new_w)
            new_h *= s
            new_w *= s
        return int(new_h + 0.5), int(new_w + 0.5)

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        if self.sample_style == "choice":
            size = int(rng.choice(self.short_edge_length))
        else:  # range
            size = int(rng.randint(
                self.short_edge_length[0], self.short_edge_length[-1] + 1
            ))
        if size == 0:
            return NoOpTransform()
        new_h, new_w = self.get_output_shape(h, w, size, self.max_size)
        return ResizeTransform(h, w, new_h, new_w)


class RandomFlip(Augmentation):
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def get_transform(self, image, rng):
        if rng.rand() < self.prob:
            return HFlipTransform(image.shape[1])
        return NoOpTransform()


class AugmentationList(Augmentation):
    def __init__(self, augs: Sequence[Augmentation]):
        self.augs = list(augs)

    def get_transform(self, image, rng):
        tfms = []
        for a in self.augs:
            t = a.get_transform(image, rng)
            tfms.append(t)
            image = t.apply_image(image)
        return TransformList(tfms)


def build_augmentation(cfg_input, is_train: bool) -> AugmentationList:
    """ref detection_utils.py:629 build_augmentation."""
    if is_train:
        augs: List[Augmentation] = [
            ResizeShortestEdge(
                cfg_input.min_size_train, cfg_input.max_size_train, "choice"
            )
        ]
        if cfg_input.random_flip:
            augs.append(RandomFlip(0.5))
    else:
        augs = [
            ResizeShortestEdge(
                (cfg_input.min_size_test,), cfg_input.max_size_test, "choice"
            )
        ]
    return AugmentationList(augs)


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]]) -> Tuple[int, int]:
    """Smallest bucket that fits (h, w); falls back to the largest-area one.

    Replaces dynamic ``ImageList.from_tensors`` padding + aspect-ratio
    grouping (ref structures/image_list.py:11, data/common.py:302): each
    image lands in one of a few static shapes so XLA compiles once per
    bucket.
    """
    best = None
    best_area = None
    for bh, bw in buckets:
        if bh >= h and bw >= w:
            area = bh * bw
            if best_area is None or area < best_area:
                best, best_area = (bh, bw), area
    if best is None:
        best = max(buckets, key=lambda b: b[0] * b[1])
    return best
