from u2seg_tpu.engine.checkpoint import Checkpointer
from u2seg_tpu.engine.events import (
    CommonMetricPrinter, EventStorage, JSONWriter, get_event_storage,
)
from u2seg_tpu.engine.hooks import HookBase
from u2seg_tpu.engine.predictor import DefaultPredictor
from u2seg_tpu.engine.train_loop import DefaultTrainer, TrainerBase

__all__ = [
    "Checkpointer", "CommonMetricPrinter", "DefaultPredictor",
    "DefaultTrainer", "EventStorage", "HookBase", "JSONWriter",
    "TrainerBase", "get_event_storage",
]
