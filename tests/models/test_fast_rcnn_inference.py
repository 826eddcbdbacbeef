"""fast_rcnn_inference vs a sequential numpy reference of the detectron2
semantics (ref fast_rcnn.py:46-173: per-class score threshold, class-aware
greedy NMS, top max_detections). The hierarchical block mining must be
exact whenever the above-threshold set fits the block/candidate caps."""
import numpy as np
import jax.numpy as jnp

from u2seg_tpu.models.roi_heads import fast_rcnn_inference


def _np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _ref(boxes, probs, hw, score_thresh, nms_thresh, max_det):
    k, cp1 = probs.shape
    c = cp1 - 1
    cand = []
    for i in range(k):
        for j in range(c):
            if probs[i, j] > score_thresh:
                bx = boxes[i].copy()
                bx[[0, 2]] = np.clip(bx[[0, 2]], 0, hw[1])
                bx[[1, 3]] = np.clip(bx[[1, 3]], 0, hw[0])
                cand.append((probs[i, j], j, bx))
    cand.sort(key=lambda t: -t[0])
    kept = []
    for s, cls, bx in cand:
        ok = True
        for s2, cls2, bx2 in kept:
            if cls2 == cls and _np_iou(bx[None], bx2[None])[0, 0] > nms_thresh:
                ok = False
                break
        if ok:
            kept.append((s, cls, bx))
        if len(kept) >= max_det:
            break
    return kept


def test_fri_matches_sequential_reference(rng):
    k, c = 64, 177  # odd class count exercises block padding
    h, w = 300, 400
    boxes = np.zeros((k, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, w - 50, k)
    boxes[:, 1] = rng.uniform(0, h - 50, k)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 120, k)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 120, k)
    # logits concentrated so a realistic handful of pairs pass 0.05
    logits = rng.randn(k, c + 1).astype(np.float32) * 3
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    det = fast_rcnn_inference(
        jnp.array(boxes)[None], jnp.array(probs)[None],
        jnp.ones((1, k), bool), jnp.array([[h, w]], jnp.int32),
        0.05, 0.5, 32,
    )
    got_scores = np.asarray(det.scores[0])[np.asarray(det.valid[0])]
    got_cls = np.asarray(det.classes[0])[np.asarray(det.valid[0])]
    got_boxes = np.asarray(det.boxes[0])[np.asarray(det.valid[0])]

    ref = _ref(boxes, probs, (h, w), 0.05, 0.5, 32)
    assert len(ref) == len(got_scores)
    for (rs, rc, rb), gs, gc, gb in zip(ref, got_scores, got_cls, got_boxes):
        np.testing.assert_allclose(gs, rs, rtol=1e-5)
        assert gc == rc
        np.testing.assert_allclose(gb, rb, rtol=1e-4, atol=1e-3)


def test_fri_nothing_above_threshold(rng):
    k, c = 16, 40
    boxes = np.tile(np.array([10, 10, 50, 50], np.float32), (k, 1))
    probs = np.full((k, c + 1), 1.0 / (c + 1), np.float32)
    det = fast_rcnn_inference(
        jnp.array(boxes)[None], jnp.array(probs)[None],
        jnp.ones((1, k), bool), jnp.array([[100, 100]], jnp.int32),
        0.05, 0.5, 8,
    )
    assert not np.asarray(det.valid).any()

def test_fri_saturated_blocks_exact_topm(rng):
    """Adversarial saturation: EVERY (roi, class) pair above threshold, so
    above-threshold scores spread over every class block. With BLOCK_KEEP
    = candidate_topk the mining must still return exactly the global top-M
    candidates (the documented cap semantics), not a block-truncated subset."""
    k, c = 128, 96
    h, w = 600, 800
    boxes = np.zeros((k, 4), np.float32)
    # spread boxes so NMS suppresses little and ordering differences show
    gx, gy = np.meshgrid(np.arange(16), np.arange(8))
    boxes[:, 0] = gx.reshape(-1) * 48.0
    boxes[:, 1] = gy.reshape(-1) * 70.0
    boxes[:, 2] = boxes[:, 0] + 40.0
    boxes[:, 3] = boxes[:, 1] + 60.0
    # all probabilities well above threshold, distinct random values
    probs = rng.uniform(0.2, 1.0, (k, c + 1)).astype(np.float32)

    cap = 64
    det = fast_rcnn_inference(
        jnp.array(boxes)[None], jnp.array(probs)[None],
        jnp.ones((1, k), bool), jnp.array([[h, w]], jnp.int32),
        0.05, 0.5, 32, candidate_topk=cap,
    )

    # oracle: global top-`cap` pairs by score, then class-aware greedy NMS
    flat = probs[:, :-1].reshape(-1)
    order = np.argsort(-flat)[:cap]
    cand = []
    for idx in order:
        i, j = divmod(int(idx), c)
        bx = boxes[i].copy()
        bx[[0, 2]] = np.clip(bx[[0, 2]], 0, w)
        bx[[1, 3]] = np.clip(bx[[1, 3]], 0, h)
        cand.append((flat[idx], j, bx))
    kept = []
    for s, cls, bx in cand:
        if all(cls2 != cls or _np_iou(bx[None], bx2[None])[0, 0] <= 0.5
               for _, cls2, bx2 in kept):
            kept.append((s, cls, bx))
        if len(kept) >= 32:
            break

    got_scores = np.asarray(det.scores[0])[np.asarray(det.valid[0])]
    got_cls = np.asarray(det.classes[0])[np.asarray(det.valid[0])]
    assert len(kept) == len(got_scores)
    for (rs, rc, _), gs, gc in zip(kept, got_scores, got_cls):
        np.testing.assert_allclose(gs, rs, rtol=1e-5)
        assert gc == rc
