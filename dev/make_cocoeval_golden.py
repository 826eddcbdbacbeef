#!/usr/bin/env python
"""Generate COCOeval golden fixtures from the reference's own C++ core.

The reference ships a C++ reimplementation of pycocotools' COCOeval
(``/root/reference/detectron2/layers/csrc/cocoeval/cocoeval.cpp``, wrapped by
``detectron2/evaluation/fast_eval_api.py:13``). pycocotools itself is not
installed here, so that C++ core is the only external oracle available for
our pure-python ``u2seg_tpu/evaluation/coco_eval_core.py``. This script:

  1. compiles the reference C++ (torch's bundled pybind11 headers) into a
     throwaway module — generator-only, nothing links against it at runtime;
  2. builds seeded synthetic COCO gt/dt sets covering the matching edge
     cases (crowd GT, explicit ignores, score ties, maxDets truncation,
     empty images, area-range boundaries) for bbox and keypoints;
  3. feeds the C++ EvaluateImages/Accumulate the same per-(img,cat) IoU
     matrices our core computes (the IoU functions are pinned by their own
     goldens; this fixture pins the *matching + accumulate* semantics);
  4. writes tests/golden/fixtures/cocoeval_golden.npz with the annotation
     sets and the C++ precision/recall/scores tensors.

Run offline:  python dev/make_cocoeval_golden.py
Consumed by:  tests/golden/test_cocoeval_golden.py
"""
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF_CSRC = "/root/reference/detectron2/layers/csrc/cocoeval"

BINDING = r"""
#include <pybind11/pybind11.h>
#include <pybind11/stl.h>
#include "cocoeval.h"
namespace py = pybind11;
PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("COCOevalEvaluateImages", &detectron2::COCOeval::EvaluateImages);
  m.def("COCOevalAccumulate", &detectron2::COCOeval::Accumulate);
  py::class_<detectron2::COCOeval::InstanceAnnotation>(m, "InstanceAnnotation")
      .def(py::init<uint64_t, double, double, bool, bool>());
  py::class_<detectron2::COCOeval::ImageEvaluation>(m, "ImageEvaluation")
      .def(py::init<>());
  py::bind_vector<std::vector<detectron2::COCOeval::ImageEvaluation>>(
      m, "ImageEvaluationVector");
}
"""


def build_ref_module():
    from torch.utils import cpp_extension

    build_dir = "/tmp/ref_cocoeval_build"
    os.makedirs(build_dir, exist_ok=True)
    binding_path = os.path.join(build_dir, "binding.cpp")
    with open(binding_path, "w") as f:
        f.write(BINDING)
    return cpp_extension.load(
        name="ref_cocoeval",
        sources=[binding_path, os.path.join(REF_CSRC, "cocoeval.cpp")],
        extra_include_paths=[REF_CSRC],
        build_directory=build_dir,
        verbose=True,
    )


# ---------------------------------------------------------------------------
# Synthetic data
# ---------------------------------------------------------------------------

def make_bbox_case(seed=0, n_images=8, n_cats=5):
    rng = np.random.RandomState(seed)
    images = [{"id": i + 1, "width": 400, "height": 300}
              for i in range(n_images)]
    categories = [{"id": c + 1, "name": f"c{c + 1}"} for c in range(n_cats)]
    gts, dts = [], []
    gid = 0
    for im in images:
        if im["id"] == n_images:     # one empty image
            continue
        for _ in range(rng.randint(1, 7)):
            gid += 1
            w, h = rng.uniform(4, 150, 2)
            x, y = rng.uniform(0, 380), rng.uniform(0, 280)
            crowd = int(rng.rand() < 0.15)
            gts.append({
                "id": gid, "image_id": im["id"],
                "category_id": int(rng.randint(1, n_cats + 1)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h),
                "iscrowd": crowd,
                # occasional explicit ignore (pycocotools honors it)
                "ignore": int(rng.rand() < 0.1),
            })
    did = 0
    for im in images:
        n_dt = rng.randint(4, 22)
        base_score = np.round(rng.rand(n_dt), 2)  # rounding makes ties
        for j in range(n_dt):
            did += 1
            # half the detections are jittered copies of random GTs (so
            # there are real matches at varied IoUs), half are random
            if gts and rng.rand() < 0.75:
                g = gts[rng.randint(len(gts))]
                x, y, w, h = g["bbox"]
                # jitter proportional to the box so matches span the
                # 0.5..0.95 IoU threshold range
                s_ = rng.uniform(0.0, 0.35)
                jit = rng.uniform(-1, 1, 4) * [w * s_, h * s_, w * s_, h * s_]
                x, y = x + jit[0], y + jit[1]
                w, h = max(2.0, w + jit[2]), max(2.0, h + jit[3])
                cat = (g["category_id"] if rng.rand() < 0.8
                       else int(rng.randint(1, n_cats + 1)))
            else:
                w, h = rng.uniform(4, 120, 2)
                x, y = rng.uniform(0, 380), rng.uniform(0, 280)
                cat = int(rng.randint(1, n_cats + 1))
            dts.append({
                "image_id": im["id"], "category_id": cat,
                "bbox": [float(x), float(y), float(w), float(h)],
                "score": float(base_score[j]),
            })
    gt_json = {"images": images, "annotations": gts,
               "categories": categories}
    return gt_json, dts


def make_kpt_case(seed=1, n_images=6):
    rng = np.random.RandomState(seed)
    images = [{"id": i + 1, "width": 400, "height": 300}
              for i in range(n_images)]
    categories = [{"id": 1, "name": "person"}]
    gts, dts = [], []
    gid = 0
    for im in images:
        for _ in range(rng.randint(1, 4)):
            gid += 1
            cx, cy = rng.uniform(60, 340), rng.uniform(60, 240)
            kp = []
            nv = 0
            for _k in range(17):
                x = cx + rng.uniform(-40, 40)
                y = cy + rng.uniform(-50, 50)
                v = int(rng.randint(0, 3))
                nv += v > 0
                kp += [float(x), float(y), v]
            w, h = rng.uniform(60, 120, 2)
            gts.append({
                "id": gid, "image_id": im["id"], "category_id": 1,
                "bbox": [cx - w / 2, cy - h / 2, float(w), float(h)],
                "area": float(w * h), "iscrowd": 0,
                "keypoints": kp, "num_keypoints": int(nv),
            })
    for im in images:
        for _ in range(rng.randint(0, 6)):
            g = gts[rng.randint(len(gts))]
            kp = np.asarray(g["keypoints"], np.float64).reshape(17, 3).copy()
            kp[:, :2] += rng.uniform(-1, 1, (17, 2)) * (
                np.sqrt(g["area"]) * rng.uniform(0.02, 0.25))
            kp[:, 2] = 1.0
            dts.append({
                "image_id": im["id"], "category_id": 1,
                "keypoints": kp.reshape(-1).tolist(),
                "score": float(np.round(rng.rand(), 2)),
                "bbox": list(map(float, g["bbox"])),
            })
    gt_json = {"images": images, "annotations": gts,
               "categories": categories}
    return gt_json, dts


# ---------------------------------------------------------------------------
# Drive the C++ core exactly as fast_eval_api.py:56-95 does
# ---------------------------------------------------------------------------

def run_cpp(module, gt_json, dt_list, iou_type):
    from u2seg_tpu.evaluation.coco_api import COCO
    from u2seg_tpu.evaluation.coco_eval_core import COCOeval

    coco_gt = COCO(json.loads(json.dumps(gt_json)))
    coco_dt = coco_gt.loadRes(json.loads(json.dumps(dt_list)))
    ev = COCOeval(coco_gt, coco_dt, iouType=iou_type)
    p = ev.params
    p.imgIds = sorted({im["id"] for im in gt_json["images"]})
    p.catIds = sorted({c["id"] for c in gt_json["categories"]})
    ev._prepare()
    # computeIoU dispatches to OKS for iouType == "keypoints"
    ious = {
        (i, c): np.asarray(ev.computeIoU(i, c), np.float64)
        for i in p.imgIds for c in p.catIds
    }

    def to_cpp(instances, is_det):
        out = []
        for inst in instances:
            out.append(module.InstanceAnnotation(
                int(inst["id"]),
                float(inst["score"]) if is_det else float(
                    inst.get("score", 0.0)),
                float(inst["area"]),
                bool(inst.get("iscrowd", 0)),
                bool(inst.get("ignore", 0)),
            ))
        return out

    gt_inst = [[to_cpp(ev._gts[i, c], False) for c in p.catIds]
               for i in p.imgIds]
    dt_inst = [[to_cpp(ev._dts[i, c], True) for c in p.catIds]
               for i in p.imgIds]
    iou_list = [
        [np.asarray(ious[i, c], np.float64).tolist() for c in p.catIds]
        for i in p.imgIds
    ]
    eval_imgs = module.COCOevalEvaluateImages(
        [list(a) for a in p.areaRng], max(p.maxDets),
        list(map(float, p.iouThrs)), iou_list, gt_inst, dt_inst,
    )
    result = module.COCOevalAccumulate(p, eval_imgs)
    counts = list(result["counts"])
    precision = np.asarray(result["precision"], np.float64).reshape(counts)
    scores = np.asarray(result["scores"], np.float64).reshape(counts)
    recall = np.asarray(result["recall"], np.float64).reshape(
        counts[:1] + counts[2:]
    )
    return precision, recall, scores


def main():
    module = build_ref_module()
    out = {}
    for name, (gt_json, dts), iou_type in [
        ("bbox", make_bbox_case(), "bbox"),
        ("keypoints", make_kpt_case(), "keypoints"),
    ]:
        precision, recall, scores = run_cpp(module, gt_json, dts, iou_type)
        out[f"{name}_gt_json"] = np.frombuffer(
            json.dumps(gt_json).encode(), np.uint8)
        out[f"{name}_dt_json"] = np.frombuffer(
            json.dumps(dts).encode(), np.uint8)
        out[f"{name}_precision"] = precision.astype(np.float32)
        out[f"{name}_recall"] = recall.astype(np.float32)
        out[f"{name}_scores"] = scores.astype(np.float32)
        print(name, "counts", precision.shape,
              "mean precision", precision[precision > -1].mean())

    path = os.path.join(ROOT, "tests", "golden", "fixtures",
                        "cocoeval_golden.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path) / 1e6, "MB")


if __name__ == "__main__":
    main()
