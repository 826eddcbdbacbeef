import numpy as np
import jax.numpy as jnp

from u2seg_tpu.ops.roi_align import roi_align, assign_boxes_to_levels, multilevel_roi_align


def roi_align_ref(feat_nchw, boxes, batch_idx, out_size, scale, ratio, aligned=True):
    """Straightforward numpy reference matching ROIAlign_cpu.cpp semantics."""
    n, c, h, w = feat_nchw.shape
    r_n = len(boxes)
    out = np.zeros((r_n, c, out_size, out_size), dtype=np.float64)

    def bilinear(img, y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            img[:, y0, x0] * (1 - ly) * (1 - lx)
            + img[:, y0, x1] * (1 - ly) * lx
            + img[:, y1, x0] * ly * (1 - lx)
            + img[:, y1, x1] * ly * lx
        )

    off = 0.5 if aligned else 0.0
    for i, box in enumerate(boxes):
        img = feat_nchw[batch_idx[i]]
        x0 = box[0] * scale - off
        y0 = box[1] * scale - off
        rw = (box[2] - box[0]) * scale
        rh = (box[3] - box[1]) * scale
        bw, bh = rw / out_size, rh / out_size
        for py in range(out_size):
            for px in range(out_size):
                acc = np.zeros(c)
                for sy in range(ratio):
                    for sx in range(ratio):
                        y = y0 + (py + (sy + 0.5) / ratio) * bh
                        x = x0 + (px + (sx + 0.5) / ratio) * bw
                        acc += bilinear(img, y, x)
                out[i, :, py, px] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_reference(rng):
    feat = rng.randn(2, 3, 16, 20).astype(np.float32)
    boxes = np.array(
        [[1.0, 2.0, 30.0, 25.0], [0.0, 0.0, 40.0, 32.0], [10.0, 5.0, 18.0, 15.0]],
        dtype=np.float32,
    )
    bidx = np.array([0, 1, 0], dtype=np.int32)
    scale = 0.5
    ref = roi_align_ref(feat, boxes, bidx, 7, scale, 2, aligned=True)
    got = roi_align(
        jnp.array(feat.transpose(0, 2, 3, 1)), jnp.array(boxes), jnp.array(bidx),
        output_size=7, spatial_scale=scale, sampling_ratio=2, aligned=True,
    )
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, ref, rtol=1e-4, atol=1e-5)


def test_roi_align_gradient_flows(rng):
    import jax

    feat = jnp.array(rng.randn(1, 8, 8, 2).astype(np.float32))
    boxes = jnp.array([[1.0, 1.0, 6.0, 6.0]])

    def f(x):
        return jnp.sum(roi_align(x, boxes, jnp.array([0]), 4, 1.0, 2))

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_level_assignment():
    boxes = jnp.array(
        [
            [0, 0, 56, 56],      # sqrt area 56 -> level 2
            [0, 0, 224, 224],    # canonical -> level 4
            [0, 0, 448, 448],    # -> level 5
            [0, 0, 1000, 1000],  # clipped to 5
        ],
        dtype=jnp.float32,
    )
    lvl = np.asarray(assign_boxes_to_levels(boxes, 2, 5))
    np.testing.assert_array_equal(lvl, [2, 4, 5, 5])


def test_multilevel_matches_single_level(rng):
    # a small box must be pooled from the fine level only
    feats = [
        jnp.array(rng.randn(1, 32, 32, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 16, 16, 4).astype(np.float32)),
    ]
    small = jnp.array([[8.0, 8.0, 40.0, 40.0]])  # sqrt area 32 -> level 2
    bidx = jnp.array([0], dtype=jnp.int32)
    got = multilevel_roi_align(feats, small, bidx, 7, strides=[4, 8], sampling_ratio=2)
    single = roi_align(feats[0], small, bidx, 7, 1.0 / 4, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(single), rtol=1e-5)


# ------------------------------------------------------- ROIAlignRotated

def _roi_align_rotated_np(feat, rois, bidx, s, scale, ratio):
    """Brute-force replica of ROIAlignRotated_cuda.cu:160-230."""
    b, h, w, c = feat.shape
    out = np.zeros((rois.shape[0], s, s, c), np.float32)

    def bilinear(img, y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        fy, fx = y - y0, x - x0
        return (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
                + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)

    for n in range(rois.shape[0]):
        img = feat[bidx[n]]
        cx = rois[n, 0] * scale - 0.5
        cy = rois[n, 1] * scale - 0.5
        rw = rois[n, 2] * scale
        rh = rois[n, 3] * scale
        th = rois[n, 4] * np.pi / 180.0
        ct, st = np.cos(th), np.sin(th)
        bh, bw = rh / s, rw / s
        for ph in range(s):
            for pw in range(s):
                acc = np.zeros(c, np.float32)
                for iy in range(ratio):
                    for ix in range(ratio):
                        yy = -rh / 2 + ph * bh + (iy + 0.5) * bh / ratio
                        xx = -rw / 2 + pw * bw + (ix + 0.5) * bw / ratio
                        y = yy * ct - xx * st + cy
                        x = yy * st + xx * ct + cx
                        acc += bilinear(img, y, x)
                out[n, ph, pw] = acc / (ratio * ratio)
    return out


def test_roi_align_rotated_matches_bruteforce(rng):
    from u2seg_tpu.ops.roi_align import roi_align_rotated

    feat = rng.randn(2, 24, 32, 3).astype(np.float32)
    rois = np.array([
        [40.0, 40.0, 48.0, 32.0, 0.0],
        [50.0, 44.0, 60.0, 24.0, 30.0],
        [30.0, 60.0, 40.0, 56.0, -75.0],
        [64.0, 40.0, 100.0, 80.0, 180.0],
    ], np.float32)
    bidx = np.array([0, 1, 0, 1], np.int32)
    ref = _roi_align_rotated_np(feat, rois, bidx, 7, 0.25, 2)
    got = roi_align_rotated(jnp.array(feat), jnp.array(rois),
                            jnp.array(bidx), 7, 0.25, 2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_roi_align_rotated_zero_angle_equals_axis_aligned(rng):
    from u2seg_tpu.ops.roi_align import roi_align, roi_align_rotated

    feat = jnp.array(rng.randn(1, 32, 32, 4).astype(np.float32))
    # (cx, cy, w, h, 0) == XYXY box [cx-w/2, cy-h/2, cx+w/2, cy+h/2]
    rot = jnp.array([[60.0, 52.0, 56.0, 40.0, 0.0]])
    xyxy = jnp.array([[32.0, 32.0, 88.0, 72.0]])
    bidx = jnp.zeros(1, jnp.int32)
    a = roi_align_rotated(feat, rot, bidx, 7, 0.25, 2)
    b = roi_align(feat, xyxy, bidx, 7, 0.25, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_multilevel_roi_align_rotated_routes(rng):
    from u2seg_tpu.ops.roi_align import (
        multilevel_roi_align_rotated, roi_align_rotated,
    )

    feats = [
        jnp.array(rng.randn(1, 32, 32, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 16, 16, 4).astype(np.float32)),
    ]
    rois = jnp.array([[40.0, 40.0, 30.0, 34.0, 25.0]])  # small -> level 0
    bidx = jnp.zeros(1, jnp.int32)
    got = multilevel_roi_align_rotated(feats, rois, bidx, 7, [4, 8], 2)
    single = roi_align_rotated(feats[0], rois, bidx, 7, 0.25, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(single), rtol=1e-5)
