import numpy as np
import jax.numpy as jnp

from u2seg_tpu.ops.nms import nms, batched_nms


def nms_ref(boxes, scores, thresh):
    """Sequential greedy reference."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] == -np.inf:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if scores[j] > scores[i]:
                continue
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            u = a1 + a2 - inter
            if u > 0 and inter / u > thresh:
                suppressed[j] = True
    return keep


def random_boxes(rng, n, size=64.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.4 + 2.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_greedy_reference(rng):
    for n in [10, 50, 300]:
        boxes = random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        ref = nms_ref(boxes, scores, 0.5)
        idx, valid = nms(jnp.array(boxes), jnp.array(scores), 0.5, max_output=n)
        got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
        assert got == ref, f"n={n}: {got} != {ref}"


def test_nms_crosses_tiles(rng):
    # more boxes than one tile so cross-tile suppression is exercised
    n = 400
    boxes = random_boxes(rng, n, size=32.0)  # dense -> many overlaps
    scores = rng.rand(n).astype(np.float32)
    ref = nms_ref(boxes, scores, 0.6)
    idx, valid = nms(jnp.array(boxes), jnp.array(scores), 0.6, max_output=n)
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    assert got == ref


def test_nms_handles_padding(rng):
    boxes = random_boxes(rng, 8)
    scores = rng.rand(8).astype(np.float32)
    pad_boxes = np.concatenate([boxes, np.zeros((4, 4), np.float32)])
    pad_scores = np.concatenate([scores, np.full(4, -np.inf, np.float32)])
    ref = nms_ref(boxes, scores, 0.5)
    idx, valid = nms(jnp.array(pad_boxes), jnp.array(pad_scores), 0.5, max_output=12)
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    assert got == ref


def test_batched_nms_no_cross_class_suppression():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    # same class: second suppressed
    idx, valid = batched_nms(
        jnp.array(boxes), jnp.array(scores), jnp.array([0, 0]), 0.5, 2
    )
    assert int(np.asarray(valid).sum()) == 1
    # different classes: both kept
    idx, valid = batched_nms(
        jnp.array(boxes), jnp.array(scores), jnp.array([0, 1]), 0.5, 2
    )
    assert int(np.asarray(valid).sum()) == 2
