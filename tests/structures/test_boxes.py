import numpy as np
import jax.numpy as jnp

from u2seg_tpu.structures import boxes as B


def random_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def iou_ref(b1, b2):
    n, m = len(b1), len(b2)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            x1 = max(b1[i, 0], b2[j, 0]); y1 = max(b1[i, 1], b2[j, 1])
            x2 = min(b1[i, 2], b2[j, 2]); y2 = min(b1[i, 3], b2[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            u = a1 + a2 - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def test_pairwise_iou_matches_reference(rng):
    b1 = random_boxes(rng, 8)
    b2 = random_boxes(rng, 5)
    got = np.asarray(B.pairwise_iou(jnp.array(b1), jnp.array(b2)))
    np.testing.assert_allclose(got, iou_ref(b1, b2), rtol=1e-5, atol=1e-6)


def test_iou_identity(rng):
    b = random_boxes(rng, 6)
    got = np.asarray(B.pairwise_iou(jnp.array(b), jnp.array(b)))
    np.testing.assert_allclose(np.diag(got), np.ones(6), rtol=1e-5)


def test_mode_conversion_roundtrip(rng):
    b = random_boxes(rng, 10)
    xywh = B.convert_mode(jnp.array(b), B.XYXY_ABS, B.XYWH_ABS)
    back = B.convert_mode(xywh, B.XYWH_ABS, B.XYXY_ABS)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-6)


def test_clip_and_area():
    b = jnp.array([[-10.0, -5.0, 50.0, 60.0]])
    clipped = B.clip(b, (40, 30))
    np.testing.assert_allclose(np.asarray(clipped), [[0, 0, 30, 40]])
    assert float(B.area(clipped)[0]) == 30 * 40


def test_box_transform_roundtrip(rng):
    src = random_boxes(rng, 16)
    tgt = random_boxes(rng, 16)
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        deltas = B.get_deltas(jnp.array(src), jnp.array(tgt), weights)
        rec = B.apply_deltas(deltas, jnp.array(src), weights)
        np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-4, atol=1e-3)


def test_apply_deltas_multiclass(rng):
    src = random_boxes(rng, 4)
    deltas = rng.randn(4, 12).astype(np.float32) * 0.1
    out = B.apply_deltas(jnp.array(deltas), jnp.array(src))
    assert out.shape == (4, 12)
    # each group of 4 decodes against the same box: group 0 equals single decode
    single = B.apply_deltas(jnp.array(deltas[:, :4]), jnp.array(src))
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(single), rtol=1e-6)


def test_matched_pairwise_iou(rng):
    b1 = random_boxes(rng, 7)
    b2 = random_boxes(rng, 7)
    got = np.asarray(B.matched_pairwise_iou(jnp.array(b1), jnp.array(b2)))
    ref = np.diag(iou_ref(b1, b2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
