"""Pin coco_eval_core to the reference's own C++ COCOeval.

Fixture ``cocoeval_golden.npz`` (generated offline by
dev/make_cocoeval_golden.py) holds synthetic COCO gt/dt sets and the
precision/recall/scores tensors produced by compiling and running the
reference's C++ core (``detectron2/layers/csrc/cocoeval/cocoeval.cpp``,
driven exactly as ``detectron2/evaluation/fast_eval_api.py:56-109`` does).
Any drift in our evaluateImg/accumulate semantics (crowd matching, ignores,
score ties, maxDets truncation, area ranges) fails here.
"""
import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "cocoeval_golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(FIXTURE):
        pytest.skip("cocoeval_golden.npz missing "
                    "(generate with dev/make_cocoeval_golden.py)")
    return np.load(FIXTURE)


def _run_ours(golden, name, iou_type):
    from u2seg_tpu.evaluation.coco_api import COCO
    from u2seg_tpu.evaluation.coco_eval_core import COCOeval

    gt_json = json.loads(bytes(golden[f"{name}_gt_json"]).decode())
    dt_list = json.loads(bytes(golden[f"{name}_dt_json"]).decode())
    coco_gt = COCO(gt_json)
    coco_dt = coco_gt.loadRes(dt_list)
    ev = COCOeval(coco_gt, coco_dt, iouType=iou_type)
    ev.params.imgIds = sorted({im["id"] for im in gt_json["images"]})
    ev.params.catIds = sorted({c["id"] for c in gt_json["categories"]})
    ev.evaluate()
    ev.accumulate()
    return ev


@pytest.mark.parametrize("name,iou_type", [
    ("bbox", "bbox"), ("keypoints", "keypoints"),
])
def test_matches_reference_cpp(golden, name, iou_type):
    ev = _run_ours(golden, name, iou_type)
    for field in ("precision", "recall", "scores"):
        ref = golden[f"{name}_{field}"].astype(np.float64)
        ours = np.asarray(ev.eval[field], np.float64)
        assert ours.shape == ref.shape, (field, ours.shape, ref.shape)
        np.testing.assert_allclose(
            ours, ref, atol=1e-6,
            err_msg=f"{name}.{field} diverges from the reference C++ core",
        )


def test_fixture_exercises_matching(golden):
    """Guard against a degenerate fixture: some real matches must exist at
    both loose and strict IoU thresholds."""
    prec = golden["bbox_precision"]
    # AP @ IoU 0.5 and 0.75, area 'all', maxDets 100
    ap50 = prec[0, :, :, 0, -1]
    ap75 = prec[5, :, :, 0, -1]
    assert ap50[ap50 > -1].mean() > 0.02
    assert (ap75 > 0).any()
    rec = golden["bbox_recall"]
    # matches must exist in at least 3 of the 5 categories
    assert (rec[0, :, 0, -1] > 0).sum() >= 3
