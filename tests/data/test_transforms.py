"""Augmentation/transform geometry tests.

Mirrors the reference's tests/data/test_transforms.py strategy: check that
image, coordinate, box, and segmentation transforms stay mutually
consistent, and pin the sampled-transform semantics of each augmentation
(ref detectron2/data/transforms/augmentation_impl.py:48-736).
"""
from __future__ import annotations

import numpy as np
import pytest

from u2seg_tpu.data import transforms as T


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def checkerboard(h=40, w=60):
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((yy // 4 + xx // 4) % 2 * 255).astype(np.uint8)
    return np.stack([img] * 3, -1)


# ---------------------------------------------------------------------------
# Transform primitives
# ---------------------------------------------------------------------------

def test_crop_transform_geometry():
    img = checkerboard()
    t = T.CropTransform(10, 5, 30, 20)
    out = t.apply_image(img)
    assert out.shape == (20, 30, 3)
    np.testing.assert_array_equal(out, img[5:25, 10:40])
    box = t.apply_box(np.array([[12.0, 7.0, 20.0, 15.0]]))
    np.testing.assert_allclose(box, [[2.0, 2.0, 10.0, 10.0]])


def test_pad_transform_geometry():
    img = checkerboard(10, 12)
    t = T.PadTransform(0, 0, 4, 6, pad_value=7, seg_pad_value=255)
    out = t.apply_image(img)
    assert out.shape == (16, 16, 3)
    assert (out[:10, :12] == img).all()
    assert (out[10:, :] == 7).all() and (out[:, 12:] == 7).all()
    seg = t.apply_segmentation(np.zeros((10, 12), np.uint8))
    assert (seg[10:, :] == 255).all()
    # left/top pads shift coordinates
    t2 = T.PadTransform(3, 2, 0, 0)
    np.testing.assert_allclose(
        t2.apply_coords(np.array([[1.0, 1.0]])), [[4.0, 3.0]]
    )


def test_blend_transform_uint8_clips():
    img = np.full((4, 4, 3), 200, np.uint8)
    t = T.BlendTransform(src_image=0, src_weight=0.0, dst_weight=2.0)
    out = t.apply_image(img)
    assert out.dtype == np.uint8
    assert (out == 255).all()
    seg = np.arange(16, dtype=np.uint8).reshape(4, 4)
    np.testing.assert_array_equal(t.apply_segmentation(seg), seg)


def test_rotation_transform_90deg_exact():
    img = checkerboard(20, 30)
    t = T.RotationTransform(20, 30, 90, expand=True)
    out = t.apply_image(img)
    assert out.shape[:2] == (30, 20)
    # 90 deg CCW: column x becomes row (bound_h-1-x)... verify via numpy rot
    np.testing.assert_array_equal(out, np.rot90(img, -3))
    # coords: corner round-trips through inverse mapping
    pts = np.array([[0.0, 0.0], [30.0, 20.0], [10.0, 5.0]])
    got = t.apply_coords(pts.copy())
    # rotating 90 CCW maps (x, y) -> (y, bound_h - x) in the expanded frame
    want = np.stack([pts[:, 1], 30.0 - pts[:, 0]], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotation_image_coords_consistent():
    """A bright dot's transformed coordinates must land on the warped dot."""
    img = np.zeros((64, 80), np.float32)
    img[40, 22] = 1.0
    t = T.RotationTransform(64, 80, 33.0, expand=True)
    out = t.apply_image(img)
    cy, cx = np.unravel_index(np.argmax(out), out.shape)
    gx, gy = t.apply_coords(np.array([[22.5, 40.5]]))[0]  # pixel center
    assert abs(gx - (cx + 0.5)) < 1.5 and abs(gy - (cy + 0.5)) < 1.5


def test_extent_transform_identity_and_coords():
    img = checkerboard(16, 24)
    t = T.ExtentTransform((0, 0, 24, 16), (16, 24))
    out = t.apply_image(img)
    np.testing.assert_allclose(
        out.astype(np.int32), img.astype(np.int32), atol=1
    )
    # a 2x zoom into the left half doubles x coords (sy stays 1)
    t2 = T.ExtentTransform((0, 0, 12, 16), (16, 24))
    np.testing.assert_allclose(
        t2.apply_coords(np.array([[6.0, 8.0]])), [[12.0, 8.0]]
    )


# ---------------------------------------------------------------------------
# Augmentations
# ---------------------------------------------------------------------------

def test_resize_scale_fits_inside_scaled_target(rng):
    aug = T.ResizeScale(0.5, 0.5, target_height=100, target_width=200)
    tfm = aug.get_transform(checkerboard(40, 60), rng)
    # scale 0.5 -> target box (50, 100); 40x60 fits with ratio min(50/40,
    # 100/60) = 1.25 -> (50, 75)
    assert (tfm.new_h, tfm.new_w) == (50, 75)


def test_fixed_size_crop_pads_and_crops(rng):
    aug = T.FixedSizeCrop((32, 32), pad=True, pad_value=9, seg_pad_value=255)
    small = checkerboard(20, 24)
    out = aug.get_transform(small, rng).apply_image(small)
    assert out.shape == (32, 32, 3)
    assert (out[20:, :] == 9).all()
    big = checkerboard(48, 64)
    tfm = aug.get_transform(big, rng)
    out = tfm.apply_image(big)
    assert out.shape == (32, 32, 3)


def test_lsj_composition_always_square(rng):
    augs = T.AugmentationList([
        T.ResizeScale(0.1, 2.0, 64, 64),
        T.FixedSizeCrop((64, 64), pad=True),
    ])
    for shape in [(30, 50), (100, 40), (64, 64), (200, 300)]:
        img = checkerboard(*shape)
        tfm = augs.get_transform(img, np.random.RandomState(1))
        assert tfm.apply_image(img).shape == (64, 64, 3)


def test_random_crop_types(rng):
    img = checkerboard(40, 60)
    for crop_type, crop_size, check in [
        ("relative", (0.5, 0.5), lambda s: s == (20, 30)),
        ("relative_range", (0.5, 0.5), lambda s: 20 <= s[0] <= 40 and 30 <= s[1] <= 60),
        ("absolute", (16, 16), lambda s: s == (16, 16)),
        ("absolute_range", (10, 30), lambda s: 10 <= s[0] <= 30 and 10 <= s[1] <= 30),
    ]:
        aug = T.RandomCrop(crop_type, crop_size)
        out = aug.get_transform(img, rng).apply_image(img)
        assert check(out.shape[:2]), (crop_type, out.shape)


def test_category_area_constraint_avoids_single_category(rng):
    sem = np.zeros((40, 40), np.uint8)
    sem[:, 20:] = 1  # two categories split down the middle
    aug = T.RandomCropWithCategoryAreaConstraint(
        "absolute", (10, 10), single_category_max_area=0.95
    )
    for seed in range(5):
        tfm = aug.get_transform(
            checkerboard(40, 40), np.random.RandomState(seed), sem_seg=sem
        )
        window = tfm.apply_segmentation(sem)
        _, cnt = np.unique(window, return_counts=True)
        assert len(cnt) > 1 and cnt.max() < 0.95 * cnt.sum()


def test_random_rotation_choice_and_noop(rng):
    aug = T.RandomRotation([0.0], sample_style="choice")
    assert isinstance(aug.get_transform(checkerboard(), rng), T.NoOpTransform)
    aug = T.RandomRotation([90.0], sample_style="choice", expand=True)
    tfm = aug.get_transform(checkerboard(20, 30), rng)
    assert (tfm.bound_h, tfm.bound_w) == (30, 20)


def test_random_apply(rng):
    aug = T.RandomApply(T.RandomFlip(1.0), prob=0.0)
    assert isinstance(aug.get_transform(checkerboard(), rng), T.NoOpTransform)
    aug = T.RandomApply(T.RandomFlip(1.0), prob=1.0)
    assert isinstance(aug.get_transform(checkerboard(), rng), T.HFlipTransform)


def test_color_augs_preserve_geometry_and_dtype(rng):
    img = checkerboard()
    for aug in [T.RandomContrast(0.5, 1.5), T.RandomBrightness(0.5, 1.5),
                T.RandomSaturation(0.5, 1.5), T.RandomLighting(1.0)]:
        tfm = aug.get_transform(img, rng)
        out = tfm.apply_image(img)
        assert out.shape == img.shape and out.dtype == np.uint8
        pts = np.array([[3.0, 4.0]])
        np.testing.assert_array_equal(tfm.apply_coords(pts.copy()), pts)


def test_random_extent_zero_fills_outside(rng):
    img = np.full((20, 20, 3), 200, np.uint8)
    aug = T.RandomExtent(scale_range=(2.0, 2.0), shift_range=(0.0, 0.0))
    tfm = aug.get_transform(img, rng)
    out = tfm.apply_image(img)
    assert out.shape[0] == 40 and out.shape[1] == 40
    assert (out[0, 0] == 0).all() and (out[20, 20] == 200).all()


def test_build_augmentation_lsj_and_crop_configs(rng):
    from u2seg_tpu.config.config import InputConfig

    lsj_cfg = InputConfig(lsj=True, lsj_image_size=64,
                          lsj_min_scale=0.5, lsj_max_scale=1.5)
    augs = T.build_augmentation(lsj_cfg, is_train=True)
    img = checkerboard(100, 70)
    out = augs.get_transform(img, rng).apply_image(img)
    assert out.shape == (64, 64, 3)

    crop_cfg = InputConfig(crop_enabled=True, crop_type="relative",
                           crop_size=(0.5, 0.5), min_size_train=(32,),
                           max_size_train=64, color_aug=True,
                           rotation_enabled=True, rotation_angles=(5.0, 10.0))
    augs = T.build_augmentation(crop_cfg, is_train=True)
    out = augs.get_transform(img, rng).apply_image(img)
    assert out.ndim == 3
