import numpy as np

from u2seg_tpu.utils.tracking import (
    BBoxIOUTracker,
    IOUWeightedHungarianBBoxIOUTracker,
    VanillaHungarianBBoxIOUTracker,
    build_tracker_head,
)
from u2seg_tpu.utils.visualizer import Visualizer, colormap


def frame(boxes, classes=None):
    boxes = np.asarray(boxes, np.float64)
    return {
        "boxes": boxes,
        "classes": np.asarray(
            classes if classes is not None else np.zeros(len(boxes)), np.int64
        ),
        "scores": np.ones(len(boxes)),
    }


def test_iou_tracker_stable_ids():
    t = BBoxIOUTracker()
    ids0 = t.update(frame([[0, 0, 10, 10], [50, 50, 60, 60]]))
    ids1 = t.update(frame([[1, 1, 11, 11], [51, 50, 61, 60]]))
    np.testing.assert_array_equal(ids0, ids1)
    # a new object gets a fresh id
    ids2 = t.update(frame([[1, 1, 11, 11], [51, 50, 61, 60], [100, 100, 110, 110]]))
    assert ids2[2] not in ids1


def test_iou_tracker_class_gate():
    t = BBoxIOUTracker()
    ids0 = t.update(frame([[0, 0, 10, 10]], [1]))
    ids1 = t.update(frame([[0, 0, 10, 10]], [2]))  # same box, new class
    assert ids0[0] != ids1[0]


def test_iou_tracker_reacquire_after_miss():
    t = BBoxIOUTracker(max_lost_frames=3)
    ids0 = t.update(frame([[0, 0, 10, 10]]))
    t.update(frame(np.zeros((0, 4))))  # object disappears
    ids2 = t.update(frame([[0, 0, 10, 10]]))
    assert ids2[0] == ids0[0]


def test_hungarian_trackers_match():
    for cls in (VanillaHungarianBBoxIOUTracker, IOUWeightedHungarianBBoxIOUTracker):
        t = cls()
        ids0 = t.update(frame([[0, 0, 10, 10], [20, 20, 30, 30]]))
        # swap order in the next frame: ids must follow the boxes
        ids1 = t.update(frame([[20, 20, 30, 30], [0, 0, 10, 10]]))
        assert ids1[0] == ids0[1] and ids1[1] == ids0[0]


def test_registry():
    t = build_tracker_head("BBoxIOUTracker", track_iou_threshold=0.3)
    assert isinstance(t, BBoxIOUTracker)


def test_visualizer_draws(rng):
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    vis = Visualizer(img)
    out = vis.draw_instance_predictions({
        "boxes": np.array([[5, 5, 30, 30]]),
        "scores": np.array([0.9]),
        "classes": np.array([3]),
        "masks": [np.ones((64, 64), bool)],
    })
    assert out.shape == img.shape
    assert not np.array_equal(out, (rng.rand(64, 64, 3) * 255).astype(np.uint8))


def test_visualizer_panoptic(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    pan = np.zeros((32, 32), np.int64)
    pan[:16] = 1
    out = Visualizer(img).draw_panoptic_seg(
        pan, [{"id": 1, "category_id": 2, "isthing": True}]
    )
    assert out.shape == img.shape


def test_colormap_distinct():
    cm = colormap(100)
    assert len(np.unique(cm, axis=0)) > 90
