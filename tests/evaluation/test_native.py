"""Native C++ RLE/matching kernels vs the numpy reference implementation."""
import numpy as np
import pytest

from u2seg_tpu import _native
from u2seg_tpu.evaluation import rle as np_rle

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native lib unavailable"
)


def random_mask(rng, h=40, w=30, p=0.4):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_native_encode_decode_matches_numpy(rng):
    for _ in range(5):
        m = random_mask(rng)
        r_np = np_rle.encode(m)
        r_nat = _native.encode(m)
        assert r_nat["counts"] == r_np["counts"]
        np.testing.assert_array_equal(_native.decode(r_np), m)
        assert _native.area(r_np) == np_rle.area(r_np)


def test_native_iou_matches_numpy(rng):
    dts = [np_rle.encode(random_mask(rng)) for _ in range(4)]
    gts = [np_rle.encode(random_mask(rng)) for _ in range(3)]
    crowd = [0, 1, 0]
    got = _native.iou(dts, gts, crowd)
    ref = np_rle.iou(dts, gts, crowd)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_native_merge(rng):
    masks = [random_mask(rng) for _ in range(3)]
    rles = [np_rle.encode(m) for m in masks]
    u = _native.decode(_native.merge(rles))
    ref = masks[0] | masks[1] | masks[2]
    np.testing.assert_array_equal(u, ref)
    i = _native.decode(_native.merge(rles, intersect=True))
    np.testing.assert_array_equal(i, masks[0] & masks[1] & masks[2])


def test_native_bbox_iou():
    dt = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], np.float64)
    gt = np.array([[0, 0, 10, 10], [100, 100, 5, 5]], np.float64)
    out = _native.bbox_iou(dt, gt, [0, 0])
    assert abs(out[0, 0] - 1.0) < 1e-12
    assert out[0, 1] == 0.0
    # crowd: inter / area(dt)
    out_c = _native.bbox_iou(dt, gt, [1, 0])
    assert abs(out_c[1, 0] - 25 / 100) < 1e-12


def _py_match(ious, gt_ignore, iscrowd, iou_thrs, dt_out):
    """Reference matching loop from coco_eval_core.evaluateImg."""
    D, G = ious.shape
    T = len(iou_thrs)
    dtm = np.zeros((T, D), np.int64)
    gtm = np.zeros((T, G), np.int64)
    dti = np.zeros((T, D), np.uint8)
    for t, thr in enumerate(iou_thrs):
        for d in range(D):
            iou = min(thr, 1 - 1e-10)
            m = -1
            for g in range(G):
                if gtm[t, g] > 0 and not iscrowd[g]:
                    continue
                if m > -1 and gt_ignore[m] == 0 and gt_ignore[g] == 1:
                    break
                if ious[d, g] < iou:
                    continue
                iou = ious[d, g]
                m = g
            if m == -1:
                dti[t, d] = dt_out[d]
                continue
            dti[t, d] = gt_ignore[m]
            dtm[t, d] = m + 1
            gtm[t, m] = d + 1
    return dtm, gtm, dti


def test_native_match_matches_python(rng):
    for _ in range(10):
        D, G = rng.randint(1, 8), rng.randint(1, 6)
        ious = rng.rand(D, G)
        gt_ignore = (rng.rand(G) < 0.3).astype(np.uint8)
        order = np.argsort(gt_ignore, kind="stable")  # ignored last
        ious = ious[:, order]
        gt_ignore = gt_ignore[order]
        iscrowd = (rng.rand(G) < 0.2).astype(np.uint8)
        dt_out = (rng.rand(D) < 0.2).astype(np.uint8)
        thrs = np.array([0.3, 0.5, 0.75])
        ref = _py_match(ious, gt_ignore, iscrowd, thrs, dt_out)
        got = _native.cocoeval_match(ious, gt_ignore, iscrowd, thrs, dt_out)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)
