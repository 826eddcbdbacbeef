"""Cityscapes instance & semantic evaluation.

Counterpart of ``detectron2/evaluation/cityscapes_evaluation.py`` (which
shells out to cityscapesscripts). cityscapesscripts isn't available here;
the instance AP follows the cityscapes protocol natively (AP averaged over
IoU 0.5:0.05:0.95 per class, matching on masks) via our COCOeval core
restricted to the cityscapes categories, and the semantic evaluator is the
standard 19-class confusion-matrix mIoU.
"""
from __future__ import annotations

import logging
from collections import OrderedDict
from typing import List, Optional

import numpy as np

from u2seg_tpu.data.cityscapes import (
    CITYSCAPES_SEM_CLASSES, CITYSCAPES_THING_CLASSES,
)
from u2seg_tpu.evaluation.coco_api import COCO
from u2seg_tpu.evaluation.coco_eval_core import COCOeval
from u2seg_tpu.evaluation.evaluator import DatasetEvaluator
from u2seg_tpu.evaluation.sem_seg_evaluator import SemSegEvaluator

logger = logging.getLogger(__name__)


class CityscapesInstanceEvaluator(DatasetEvaluator):
    """Mask AP over the 8 cityscapes thing classes (COCO-protocol core on
    cityscapes data — the official scripts' AP definition coincides with
    COCO's 10-threshold mask AP up to their ignore handling)."""

    def __init__(self, dataset_dicts: List[dict]):
        # build a COCO-format GT index from the loaded dicts
        images, anns = [], []
        aid = 1
        for d in dataset_dicts:
            images.append({
                "id": d["image_id"], "height": d["height"], "width": d["width"],
            })
            for a in d.get("annotations", []):
                r = dict(a)
                r["id"] = aid
                r["image_id"] = d["image_id"]
                aid += 1
                anns.append(r)
        self._gt = COCO({
            "images": images,
            "annotations": anns,
            "categories": [
                {"id": i, "name": n}
                for i, n in enumerate(CITYSCAPES_THING_CLASSES)
            ],
        })
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        for inp, out in zip(inputs, outputs):
            inst = out.get("instances")
            if inst is None:
                continue
            boxes = np.asarray(inst["boxes"], np.float64)
            for i in range(len(inst["scores"])):
                x0, y0, x1, y1 = boxes[i]
                rec = {
                    "image_id": inp["image_id"],
                    "category_id": int(inst["classes"][i]),
                    "bbox": [x0, y0, x1 - x0, y1 - y0],
                    "score": float(inst["scores"][i]),
                }
                rles = inst.get("rles")
                if rles is not None:
                    rec["segmentation"] = rles[i]
                self._predictions.append(rec)

    def evaluate(self) -> Optional[dict]:
        if not self._predictions:
            return {}
        task = "segm" if "segmentation" in self._predictions[0] else "bbox"
        dt = self._gt.loadRes(list(self._predictions))
        E = COCOeval(self._gt, dt, iouType=task)
        E.evaluate()
        E.accumulate()
        stats = E.summarize()
        return OrderedDict(
            cityscapes_instance={"AP": stats[0] * 100, "AP50": stats[1] * 100}
        )


class CityscapesSemSegEvaluator(SemSegEvaluator):
    """19-class mIoU (the official cityscapes semantic metric)."""

    def __init__(self):
        super().__init__(
            mode="supervised",
            num_pred_classes=len(CITYSCAPES_SEM_CLASSES),
            ignore_label=255,
        )

    def evaluate(self):
        out = super().evaluate()
        return OrderedDict(cityscapes_sem_seg=out["sem_seg"])
