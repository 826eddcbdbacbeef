from u2seg_tpu.evaluation.coco_api import COCO
from u2seg_tpu.evaluation.coco_eval_core import COCOeval
from u2seg_tpu.evaluation.coco_evaluator import COCOEvaluator
from u2seg_tpu.evaluation.evaluator import (
    DatasetEvaluator,
    DatasetEvaluators,
    inference_on_dataset,
)
from u2seg_tpu.evaluation.panoptic_evaluator import COCOPanopticEvaluator
from u2seg_tpu.evaluation.rotated_coco_evaluator import (
    RotatedCOCOeval,
    RotatedCOCOEvaluator,
)
from u2seg_tpu.evaluation.sem_seg_evaluator import SemSegEvaluator

__all__ = [
    "COCO", "COCOeval", "COCOEvaluator", "COCOPanopticEvaluator",
    "DatasetEvaluator", "DatasetEvaluators", "RotatedCOCOeval",
    "RotatedCOCOEvaluator", "SemSegEvaluator", "inference_on_dataset",
]
