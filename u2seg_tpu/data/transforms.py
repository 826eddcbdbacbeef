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
    reference's ResizeTransform (transform.py) in geometry.

    Interpolation divergence: the reference resizes uint8 images via PIL
    BILINEAR; this build uses cv2 bilinear (and the batched predictor's
    device path resizes float32 on-device). Pixel values can differ by
    ~1 ulp of uint8, which shifts real-dataset AP/PQ against detectron2
    in the 3rd decimal. Internal device/host parity is unaffected (both
    sides share one path). If exact reference preprocessing is ever
    needed, swap apply_image to PIL here and disable the predictor's
    raw-u8 device resize (engine/predictor.py _prepare_raw)."""

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


class CropTransform(Transform):
    """Crop ``[y0:y0+h, x0:x0+w]``; coords shift by (-x0, -y0)
    (fvcore CropTransform semantics, used by the reference's crop augs)."""

    def __init__(self, x0: int, y0: int, w: int, h: int):
        self.x0, self.y0, self.w, self.h = int(x0), int(y0), int(w), int(h)

    def apply_image(self, img):
        return np.ascontiguousarray(
            img[self.y0:self.y0 + self.h, self.x0:self.x0 + self.w]
        )

    def apply_coords(self, coords):
        coords = coords.astype(np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


class PadTransform(Transform):
    """Pad right/bottom (and optionally left/top) with constant values;
    segmentation pads with ``seg_pad_value`` (fvcore PadTransform semantics,
    used by FixedSizeCrop; ref augmentation_impl.py:352-366)."""

    def __init__(self, x0: int, y0: int, x1: int, y1: int,
                 pad_value: float = 128.0, seg_pad_value: int = 255):
        self.x0, self.y0, self.x1, self.y1 = int(x0), int(y0), int(x1), int(y1)
        self.pad_value = pad_value
        self.seg_pad_value = seg_pad_value

    def _pad(self, img, value):
        pads = [(self.y0, self.y1), (self.x0, self.x1)]
        pads += [(0, 0)] * (img.ndim - 2)
        return np.pad(img, pads, constant_values=value)

    def apply_image(self, img):
        return self._pad(img, self.pad_value)

    def apply_coords(self, coords):
        coords = coords.astype(np.float64).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords

    def apply_segmentation(self, seg):
        return self._pad(seg, self.seg_pad_value)


class BlendTransform(Transform):
    """out = src_weight * src_image + dst_weight * img — the reference's
    photometric primitive (fvcore BlendTransform; ref
    augmentation_impl.py:526-634). Geometry is untouched."""

    def __init__(self, src_image, src_weight: float, dst_weight: float):
        self.src_image = src_image
        self.src_weight = src_weight
        self.dst_weight = dst_weight

    def apply_image(self, img):
        if img.dtype == np.uint8:
            out = (self.src_weight * self.src_image
                   + self.dst_weight * img.astype(np.float32))
            return np.clip(out, 0, 255).astype(np.uint8)
        return self.src_weight * self.src_image + self.dst_weight * img

    def apply_coords(self, coords):
        return coords

    def apply_segmentation(self, seg):
        return seg


class RotationTransform(Transform):
    """Rotate ``angle`` degrees counter-clockwise around ``center``
    (ref transform.py:162 RotationTransform, incl. the half-pixel image
    offset and expand-to-bounds behavior)."""

    def __init__(self, h: int, w: int, angle: float, expand: bool = True,
                 center: Optional[Tuple[float, float]] = None, interp=None):
        import cv2

        self.h, self.w, self.angle, self.expand = h, w, angle, expand
        image_center = np.array((w / 2, h / 2))
        self.center = image_center if center is None else np.asarray(center)
        self.image_center = image_center
        self.interp = cv2.INTER_LINEAR if interp is None else interp
        abs_cos = abs(np.cos(np.deg2rad(angle)))
        abs_sin = abs(np.sin(np.deg2rad(angle)))
        if expand:
            self.bound_w, self.bound_h = np.rint(
                [h * abs_sin + w * abs_cos, h * abs_cos + w * abs_sin]
            ).astype(int)
        else:
            self.bound_w, self.bound_h = w, h
        self.rm_coords = self._rotation_matrix()
        # cv2.warpAffine samples pixel centers at integer coords: shift by
        # -0.5 so the geometric map and the image map agree (the reference
        # carries the same correction)
        self.rm_image = self._rotation_matrix(offset=-0.5)

    def _rotation_matrix(self, offset: float = 0.0):
        import cv2

        center = (self.center[0] + offset, self.center[1] + offset)
        rm = cv2.getRotationMatrix2D(tuple(center), self.angle, 1)
        if self.expand:
            rot_center = cv2.transform(
                self.image_center[None, None, :] + offset, rm
            )[0, 0, :]
            rm[:, 2] += (
                np.array([self.bound_w / 2, self.bound_h / 2]) + offset
                - rot_center
            )
        return rm

    def apply_image(self, img, interp=None):
        import cv2

        if len(img) == 0 or self.angle % 360 == 0:
            return img
        return cv2.warpAffine(
            img, self.rm_image, (self.bound_w, self.bound_h),
            flags=self.interp if interp is None else interp,
        )

    def apply_coords(self, coords):
        import cv2

        coords = np.asarray(coords, dtype=np.float64)
        if len(coords) == 0 or self.angle % 360 == 0:
            return coords
        return cv2.transform(coords[:, np.newaxis, :], self.rm_coords)[:, 0, :]

    def apply_segmentation(self, seg):
        import cv2

        return self.apply_image(seg, interp=cv2.INTER_NEAREST)


class ExtentTransform(Transform):
    """Resample a source sub-rectangle (may extend past the image; outside
    pixels are zero) onto a fixed output size (ref transform.py:36
    ExtentTransform, the PIL EXTENT op, realized with a cv2 affine warp)."""

    def __init__(self, src_rect: Tuple[float, float, float, float],
                 output_size: Tuple[int, int], interp=None):
        self.src_rect = src_rect
        self.output_size = output_size  # (h, w)
        self.interp = interp

    def apply_image(self, img):
        import cv2

        x0, y0, x1, y1 = self.src_rect
        out_h, out_w = self.output_size
        sx = out_w / (x1 - x0)
        sy = out_h / (y1 - y0)
        # PIL EXTENT maps the continuous rect onto the output grid; in cv2's
        # pixel-center convention that is dst = (src - rect0) * s - 0.5
        m = np.array([[sx, 0, -x0 * sx - 0.5 + 0.5 * sx],
                      [0, sy, -y0 * sy - 0.5 + 0.5 * sy]], np.float64)
        interp = self.interp if self.interp is not None else cv2.INTER_LINEAR
        return cv2.warpAffine(img, m, (out_w, out_h), flags=interp,
                              borderMode=cv2.BORDER_CONSTANT, borderValue=0)

    def apply_coords(self, coords):
        x0, y0, x1, y1 = self.src_rect
        out_h, out_w = self.output_size
        coords = coords.astype(np.float64).copy()
        coords[:, 0] = (coords[:, 0] - x0) * (out_w / (x1 - x0))
        coords[:, 1] = (coords[:, 1] - y0) * (out_h / (y1 - y0))
        return coords

    def apply_segmentation(self, seg):
        import cv2

        x0, y0, x1, y1 = self.src_rect
        out_h, out_w = self.output_size
        sx = out_w / (x1 - x0)
        sy = out_h / (y1 - y0)
        m = np.array([[sx, 0, -x0 * sx - 0.5 + 0.5 * sx],
                      [0, sy, -y0 * sy - 0.5 + 0.5 * sy]], np.float64)
        return cv2.warpAffine(seg, m, (out_w, out_h),
                              flags=cv2.INTER_NEAREST,
                              borderMode=cv2.BORDER_CONSTANT, borderValue=0)


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


class RandomApply(Augmentation):
    """Apply ``aug`` with probability ``prob`` (ref augmentation_impl.py:48)."""

    def __init__(self, aug: Augmentation, prob: float = 0.5):
        self.aug = aug
        self.prob = prob

    def get_transform(self, image, rng, **extras):
        if rng.rand() < self.prob:
            return _call_aug(self.aug, image, rng, extras)
        return NoOpTransform()


class Resize(Augmentation):
    """Resize to a fixed (h, w) (ref augmentation_impl.py:114)."""

    def __init__(self, shape: Tuple[int, int], interp=None):
        self.shape = shape
        self.interp = interp

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        return ResizeTransform(h, w, self.shape[0], self.shape[1])


class RandomResize(Augmentation):
    """Resize to a random (h, w) from ``shape_list``
    (ref augmentation_impl.py:636)."""

    def __init__(self, shape_list: Sequence[Tuple[int, int]]):
        self.shape_list = list(shape_list)

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        nh, nw = self.shape_list[rng.randint(len(self.shape_list))]
        return ResizeTransform(h, w, nh, nw)


class ResizeScale(Augmentation):
    """Scale the (target_h, target_w) box by uniform(min_scale, max_scale)
    and resize the image to fit inside it, keeping aspect ratio — the resize
    half of large-scale jitter (LSJ; ref augmentation_impl.py:203)."""

    def __init__(self, min_scale: float, max_scale: float,
                 target_height: int, target_width: int):
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.target_height = target_height
        self.target_width = target_width

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        scale = rng.uniform(self.min_scale, self.max_scale)
        out_scale = min(self.target_height * scale / h,
                        self.target_width * scale / w)
        new_h = int(np.round(h * out_scale))
        new_w = int(np.round(w * out_scale))
        return ResizeTransform(h, w, new_h, new_w)


class FixedSizeCrop(Augmentation):
    """Random-crop to ``crop_size`` when larger, right/bottom-pad when
    smaller — the crop half of LSJ (ref augmentation_impl.py:307)."""

    def __init__(self, crop_size: Tuple[int, int], pad: bool = True,
                 pad_value: float = 128.0, seg_pad_value: int = 255):
        self.crop_size = tuple(crop_size)
        self.pad = pad
        self.pad_value = pad_value
        self.seg_pad_value = seg_pad_value

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        ch, cw = self.crop_size
        oy = int(round(max(h - ch, 0) * rng.uniform(0.0, 1.0)))
        ox = int(round(max(w - cw, 0) * rng.uniform(0.0, 1.0)))
        tfms = [CropTransform(ox, oy, min(cw, w), min(ch, h))]
        if self.pad:
            tfms.append(PadTransform(
                0, 0, max(cw - w, 0), max(ch - h, 0),
                self.pad_value, self.seg_pad_value,
            ))
        return TransformList(tfms)


class RandomCrop(Augmentation):
    """Random fixed/relative-size crop (ref augmentation_impl.py:373)."""

    def __init__(self, crop_type: str, crop_size):
        assert crop_type in (
            "relative", "relative_range", "absolute", "absolute_range"
        ), crop_type
        self.crop_type = crop_type
        self.crop_size = crop_size

    def get_crop_size(self, image_size, rng) -> Tuple[int, int]:
        h, w = image_size
        if self.crop_type == "relative":
            ch, cw = self.crop_size
            return int(h * ch + 0.5), int(w * cw + 0.5)
        if self.crop_type == "relative_range":
            lo = np.asarray(self.crop_size, np.float32)
            ch, cw = lo + rng.rand(2) * (1 - lo)
            return int(h * ch + 0.5), int(w * cw + 0.5)
        if self.crop_type == "absolute":
            return min(self.crop_size[0], h), min(self.crop_size[1], w)
        # absolute_range
        assert self.crop_size[0] <= self.crop_size[1]
        ch = rng.randint(min(h, self.crop_size[0]), min(h, self.crop_size[1]) + 1)
        cw = rng.randint(min(w, self.crop_size[0]), min(w, self.crop_size[1]) + 1)
        return ch, cw

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        ch, cw = self.get_crop_size((h, w), rng)
        assert h >= ch and w >= cw, (h, w, ch, cw)
        y0 = rng.randint(h - ch + 1)
        x0 = rng.randint(w - cw + 1)
        return CropTransform(x0, y0, cw, ch)


class RandomCropWithCategoryAreaConstraint(Augmentation):
    """RandomCrop that retries (<=10x) until no semantic category covers
    more than ``single_category_max_area`` of the crop
    (ref augmentation_impl.py:435 RandomCrop_CategoryAreaConstraint)."""

    needs = ("sem_seg",)

    def __init__(self, crop_type: str, crop_size,
                 single_category_max_area: float = 1.0,
                 ignored_category: Optional[int] = None):
        self.crop_aug = RandomCrop(crop_type, crop_size)
        self.single_category_max_area = single_category_max_area
        self.ignored_category = ignored_category

    def get_transform(self, image, rng, sem_seg=None):
        if self.single_category_max_area >= 1.0 or sem_seg is None:
            return self.crop_aug.get_transform(image, rng)
        h, w = sem_seg.shape
        for _ in range(10):
            ch, cw = self.crop_aug.get_crop_size((h, w), rng)
            y0 = rng.randint(h - ch + 1)
            x0 = rng.randint(w - cw + 1)
            window = sem_seg[y0:y0 + ch, x0:x0 + cw]
            labels, cnt = np.unique(window, return_counts=True)
            if self.ignored_category is not None:
                cnt = cnt[labels != self.ignored_category]
            if len(cnt) > 1 and np.max(cnt) < np.sum(cnt) * self.single_category_max_area:
                break
        return CropTransform(x0, y0, cw, ch)


class RandomRotation(Augmentation):
    """Rotate by a sampled angle, optionally around a sampled relative
    center (ref augmentation_impl.py:253)."""

    def __init__(self, angle, expand: bool = True, center=None,
                 sample_style: str = "range", interp=None):
        assert sample_style in ("range", "choice"), sample_style
        self.is_range = sample_style == "range"
        if isinstance(angle, (float, int)):
            angle = (angle, angle)
        if center is not None and isinstance(center[0], (float, int)):
            center = (center, center)
        self.angle, self.expand, self.center = angle, expand, center
        self.interp = interp

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        center = None
        if self.is_range:
            angle = rng.uniform(self.angle[0], self.angle[1])
            if self.center is not None:
                center = (rng.uniform(self.center[0][0], self.center[1][0]),
                          rng.uniform(self.center[0][1], self.center[1][1]))
        else:
            angle = self.angle[rng.randint(len(self.angle))]
            if self.center is not None:
                center = self.center[rng.randint(len(self.center))]
        if center is not None:
            center = (w * center[0], h * center[1])
        if angle % 360 == 0:
            return NoOpTransform()
        return RotationTransform(h, w, angle, expand=self.expand,
                                 center=center, interp=self.interp)


class RandomExtent(Augmentation):
    """Crop a random scaled/shifted sub-rect (possibly out of bounds,
    zero-filled) around the image center (ref augmentation_impl.py:481)."""

    def __init__(self, scale_range: Tuple[float, float],
                 shift_range: Tuple[float, float]):
        self.scale_range = scale_range
        self.shift_range = shift_range

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        rect = np.array([-0.5 * w, -0.5 * h, 0.5 * w, 0.5 * h])
        rect *= rng.uniform(self.scale_range[0], self.scale_range[1])
        rect[0::2] += self.shift_range[0] * w * (rng.rand() - 0.5)
        rect[1::2] += self.shift_range[1] * h * (rng.rand() - 0.5)
        rect[0::2] += 0.5 * w
        rect[1::2] += 0.5 * h
        return ExtentTransform(
            src_rect=tuple(rect),
            output_size=(int(rect[3] - rect[1]), int(rect[2] - rect[0])),
        )


class RandomContrast(Augmentation):
    """Blend with the image mean (ref augmentation_impl.py:526)."""

    def __init__(self, intensity_min: float, intensity_max: float):
        self.intensity_min, self.intensity_max = intensity_min, intensity_max

    def get_transform(self, image, rng):
        w = rng.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(image.mean(), src_weight=1 - w, dst_weight=w)


class RandomBrightness(Augmentation):
    """Blend with black (ref augmentation_impl.py:552)."""

    def __init__(self, intensity_min: float, intensity_max: float):
        self.intensity_min, self.intensity_max = intensity_min, intensity_max

    def get_transform(self, image, rng):
        w = rng.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(0, src_weight=1 - w, dst_weight=w)


class RandomSaturation(Augmentation):
    """Blend with the luma grayscale; RGB input (ref augmentation_impl.py:578)."""

    def __init__(self, intensity_min: float, intensity_max: float):
        self.intensity_min, self.intensity_max = intensity_min, intensity_max

    def get_transform(self, image, rng):
        assert image.shape[-1] == 3, "RandomSaturation needs RGB"
        w = rng.uniform(self.intensity_min, self.intensity_max)
        gray = image.dot([0.299, 0.587, 0.114])[:, :, np.newaxis]
        return BlendTransform(gray, src_weight=1 - w, dst_weight=w)


class RandomLighting(Augmentation):
    """AlexNet PCA lighting jitter over ImageNet statistics; RGB input
    (ref augmentation_impl.py:607)."""

    _EIGEN_VECS = np.array([[-0.5675, 0.7192, 0.4009],
                            [-0.5808, -0.0045, -0.8140],
                            [-0.5836, -0.6948, 0.4203]])
    _EIGEN_VALS = np.array([0.2175, 0.0188, 0.0045])

    def __init__(self, scale: float):
        self.scale = scale

    def get_transform(self, image, rng):
        assert image.shape[-1] == 3, "RandomLighting needs RGB"
        weights = rng.normal(scale=self.scale, size=3)
        return BlendTransform(
            self._EIGEN_VECS.dot(weights * self._EIGEN_VALS),
            src_weight=1.0, dst_weight=1.0,
        )


def _call_aug(aug: Augmentation, image, rng, extras: dict) -> Transform:
    """Invoke get_transform, forwarding only the extra inputs (sem_seg, ...)
    the augmentation declares via its ``needs`` attribute."""
    needs = getattr(aug, "needs", ())
    kwargs = {k: extras.get(k) for k in needs}
    return aug.get_transform(image, rng, **kwargs)


class AugmentationList(Augmentation):
    def __init__(self, augs: Sequence[Augmentation]):
        self.augs = list(augs)

    def get_transform(self, image, rng, **extras):
        tfms = []
        for a in self.augs:
            t = _call_aug(a, image, rng, extras)
            tfms.append(t)
            image = t.apply_image(image)
            if "sem_seg" in extras and extras["sem_seg"] is not None:
                extras["sem_seg"] = t.apply_segmentation(extras["sem_seg"])
        return TransformList(tfms)


def build_augmentation(cfg_input, is_train: bool) -> AugmentationList:
    """ref detection_utils.py:629 build_augmentation, extended with the
    reference's INPUT.CROP recipe (dataset_mapper.py:49-56) and the LSJ
    (ResizeScale + FixedSizeCrop) recipe from the LazyConfig model zoo."""
    if not is_train:
        return AugmentationList([
            ResizeShortestEdge(
                (cfg_input.min_size_test,), cfg_input.max_size_test, "choice"
            )
        ])

    augs: List[Augmentation] = []
    if getattr(cfg_input, "lsj", False):
        size = cfg_input.lsj_image_size
        augs.append(ResizeScale(
            cfg_input.lsj_min_scale, cfg_input.lsj_max_scale, size, size
        ))
        augs.append(FixedSizeCrop((size, size), pad=True))
    else:
        if getattr(cfg_input, "crop_enabled", False):
            augs.append(RandomCropWithCategoryAreaConstraint(
                cfg_input.crop_type, cfg_input.crop_size,
                cfg_input.crop_single_category_max_area, ignored_category=255,
            ))
        augs.append(ResizeShortestEdge(
            cfg_input.min_size_train, cfg_input.max_size_train, "choice"
        ))
    if getattr(cfg_input, "rotation_enabled", False):
        augs.append(RandomRotation(
            list(cfg_input.rotation_angles),
            expand=cfg_input.rotation_expand,
            sample_style=cfg_input.rotation_sample_style,
        ))
    if getattr(cfg_input, "color_aug", False):
        augs += [RandomBrightness(0.9, 1.1), RandomContrast(0.9, 1.1),
                 RandomSaturation(0.9, 1.1)]
    if cfg_input.random_flip:
        augs.append(RandomFlip(0.5))
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
