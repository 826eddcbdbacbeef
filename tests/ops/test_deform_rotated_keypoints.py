import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)
import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.deform_conv import deform_conv2d
from u2seg_tpu.structures.keypoints import (
    heatmaps_to_keypoints, keypoints_to_heatmap,
)
from u2seg_tpu.structures.rotated_boxes import (
    clip_rotated, corners, nms_rotated, pairwise_iou_rotated,
)


# ---------------- deform conv ----------------

def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets, deformable conv == standard conv."""
    x = jnp.array(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.array(rng.randn(3, 3, 3, 4).astype(np.float32))
    offsets = jnp.zeros((1, 8, 8, 18))
    got = deform_conv2d(x, offsets, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deform_conv_integer_shift(rng):
    """A +1 x-offset on every tap equals convolving the shifted image."""
    x = jnp.array(rng.randn(1, 10, 10, 2).astype(np.float32))
    w = jnp.array(rng.randn(3, 3, 2, 2).astype(np.float32))
    offsets = jnp.zeros((1, 10, 10, 18)).at[..., 1::2].set(1.0)  # dx=+1
    got = deform_conv2d(x, offsets, w, padding=1)
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    ref = jax.lax.conv_general_dilated(
        x_shift, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # interior matches (borders differ by zero-padding semantics)
    np.testing.assert_allclose(
        np.asarray(got)[:, 1:-1, 1:-2], np.asarray(ref)[:, 1:-1, 1:-2],
        rtol=1e-4, atol=1e-5,
    )


def test_deform_conv_gradient(rng):
    x = jnp.array(rng.randn(1, 6, 6, 2).astype(np.float32))
    w = jnp.array(rng.randn(3, 3, 2, 2).astype(np.float32))
    off = jnp.array(rng.randn(1, 6, 6, 18).astype(np.float32) * 0.5)

    g = jax.grad(lambda o: jnp.sum(deform_conv2d(x, o, w, padding=1) ** 2))(off)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


# ---------------- rotated boxes ----------------

def test_rotated_iou_axis_aligned_matches():
    from u2seg_tpu.structures import boxes as B

    b1 = jnp.array([[10.0, 10.0, 8.0, 6.0, 0.0]])   # cx,cy,w,h,angle
    b2 = jnp.array([[12.0, 11.0, 8.0, 6.0, 0.0]])
    got = float(pairwise_iou_rotated(b1, b2)[0, 0])
    xy1 = jnp.array([[6.0, 7.0, 14.0, 13.0]])
    xy2 = jnp.array([[8.0, 8.0, 16.0, 14.0]])
    ref = float(B.pairwise_iou(xy1, xy2)[0, 0])
    assert abs(got - ref) < 1e-5


def test_rotated_iou_90deg_symmetry():
    sq = jnp.array([[0.0, 0.0, 4.0, 4.0, 0.0]])
    sq90 = jnp.array([[0.0, 0.0, 4.0, 4.0, 90.0]])
    assert abs(float(pairwise_iou_rotated(sq, sq90)[0, 0]) - 1.0) < 1e-5


def test_rotated_iou_45deg_diamond():
    # square side 2 vs itself rotated 45°: intersection is the octagon of
    # area 4(2√2−2); union 8 − that; IoU = 1/√2 ≈ 0.7071
    sq = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 2.0, 2.0, 45.0]])
    got = float(pairwise_iou_rotated(sq, d)[0, 0])
    assert abs(got - 1 / np.sqrt(2)) < 1e-4


def test_rotated_nms():
    boxes = jnp.array([
        [10.0, 10.0, 8.0, 4.0, 30.0],
        [10.0, 10.0, 8.0, 4.0, 32.0],   # heavy overlap with #0
        [30.0, 30.0, 8.0, 4.0, 0.0],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep, valid = nms_rotated(boxes, scores, 0.5, 3)
    kept = set(np.asarray(keep)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_clip_rotated_only_near_axis():
    boxes = jnp.array([
        [2.0, 2.0, 10.0, 10.0, 0.5],    # near axis: clipped
        [2.0, 2.0, 10.0, 10.0, 45.0],   # rotated: untouched
    ])
    out = np.asarray(clip_rotated(boxes, (20, 20)))
    assert out[0][2] < 10.0   # width clipped
    np.testing.assert_allclose(out[1], np.asarray(boxes[1]))


# ---------------- keypoints ----------------

def test_keypoint_heatmap_roundtrip(rng):
    hs = 14
    rois = jnp.array([[10.0, 20.0, 66.0, 76.0]])
    kps = jnp.array([[[24.0, 40.0, 2.0], [60.0, 70.0, 1.0], [0.0, 0.0, 0.0]]])
    lin, valid = keypoints_to_heatmap(kps, rois, hs)
    assert bool(valid[0, 0]) and bool(valid[0, 1])
    assert not bool(valid[0, 2])  # invisible
    # build one-hot heatmaps from the indices and decode back
    maps = np.zeros((1, hs, hs, 3), np.float32)
    for k in range(2):
        i = int(lin[0, k])
        maps[0, i // hs, i % hs, k] = 10.0
    dec = heatmaps_to_keypoints(jnp.array(maps), rois)
    # recovered coords within one heatmap bin (4px here)
    np.testing.assert_allclose(
        np.asarray(dec)[0, :2, :2], np.asarray(kps)[0, :2, :2], atol=4.1
    )


def test_rotated_box_transform_roundtrip(rng):
    from u2seg_tpu.structures.rotated_boxes import (
        apply_deltas_rotated, get_deltas_rotated,
    )

    src = jnp.array(rng.rand(8, 5).astype(np.float32))
    src = src.at[:, 2:4].set(src[:, 2:4] * 20 + 5)
    src = src.at[:, 4].set((src[:, 4] - 0.5) * 180)
    tgt = jnp.array(rng.rand(8, 5).astype(np.float32))
    tgt = tgt.at[:, 2:4].set(tgt[:, 2:4] * 20 + 5)
    tgt = tgt.at[:, 4].set((tgt[:, 4] - 0.5) * 180)
    deltas = get_deltas_rotated(src, tgt)
    rec = np.asarray(apply_deltas_rotated(deltas, src))
    np.testing.assert_allclose(rec[:, :4], np.asarray(tgt)[:, :4],
                               rtol=1e-4, atol=1e-3)
    da = (rec[:, 4] - np.asarray(tgt)[:, 4] + 180) % 360 - 180
    np.testing.assert_allclose(da, 0, atol=1e-3)


def test_keypoint_head_and_loss(rng):
    from u2seg_tpu.models.keypoint_head import (
        KRCNNConvDeconvUpsampleHead, keypoint_rcnn_inference,
        keypoint_rcnn_loss,
    )

    head = KRCNNConvDeconvUpsampleHead(num_keypoints=5, conv_dims=(32, 32))
    x = jnp.array(rng.rand(2, 14, 14, 8).astype(np.float32))
    v = head.init({"params": jax.random.PRNGKey(0)}, x)
    hm = head.apply(v, x)
    assert hm.shape == (2, 56, 56, 5)
    rois = jnp.array([[0.0, 0.0, 56.0, 56.0], [10.0, 10.0, 40.0, 40.0]])
    gt = jnp.array(rng.rand(2, 5, 3).astype(np.float32)) * 30 + 10
    gt = gt.at[..., 2].set(2.0)
    loss = keypoint_rcnn_loss(hm, gt, rois, jnp.array([True, True]))
    assert np.isfinite(float(loss))
    dec = keypoint_rcnn_inference(hm, rois)
    assert dec.shape == (2, 5, 4)
