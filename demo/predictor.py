"""Visualization demo helpers + pipelined async predictor.

Counterpart of the reference ``demo/predictor.py`` (VisualizationDemo :15,
AsyncPredictor :132). The reference's AsyncPredictor spawns one worker
process per GPU; here a worker THREAD pipelines host pre/post-processing
with device execution (jax dispatch is async, so one thread suffices to
keep the chip busy while the main thread decodes video frames).
"""
from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np


class VisualizationDemo:
    """ref demo/predictor.py:15 — see demo/u2seg_demo.py for the CLI."""

    def __init__(self, cfg, instance_mode: Optional[str] = None,
                 parallel: bool = False):
        from u2seg_tpu.engine.predictor import DefaultPredictor

        self.predictor = (
            AsyncPredictor(cfg) if parallel else DefaultPredictor(cfg)
        )

    def run_on_image(self, image_rgb: np.ndarray):
        from u2seg_tpu.utils.visualizer import Visualizer

        predictions = self.predictor(image_rgb)
        vis = Visualizer(image_rgb)
        if "panoptic" in predictions:
            out = vis.draw_panoptic_seg(
                predictions["panoptic"], predictions["segments"]
            )
        else:
            out = vis.draw_instance_predictions(predictions["instances"])
        return predictions, out


class AsyncPredictor:
    """Thread-pipelined predictor: put() frames, get() results in order
    (ref predictor.py:132 — process-per-GPU there, thread+async-dispatch
    here; the TPU queue depth keeps the device busy)."""

    def __init__(self, cfg, queue_size: int = 3):
        from u2seg_tpu.engine.predictor import DefaultPredictor

        self._task_q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._result_q: "queue.Queue" = queue.Queue()
        self._predictor = DefaultPredictor(cfg)
        self._put_idx = 0
        self._get_idx = 0
        self._buffer = {}
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._task_q.get()
            if item is None:
                return
            idx, image = item
            result = self._predictor(image)
            self._result_q.put((idx, result))

    def put(self, image: np.ndarray):
        self._task_q.put((self._put_idx, image))
        self._put_idx += 1

    def get(self):
        while self._get_idx not in self._buffer:
            idx, res = self._result_q.get()
            self._buffer[idx] = res
        out = self._buffer.pop(self._get_idx)
        self._get_idx += 1
        return out

    def __call__(self, image: np.ndarray):
        self.put(image)
        return self.get()

    def shutdown(self):
        self._task_q.put(None)

    def __len__(self):
        return self._put_idx - self._get_idx
