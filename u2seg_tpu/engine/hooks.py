"""Trainer hooks.

Counterpart of ``detectron2/engine/train_loop.py:19`` (HookBase) and
``engine/hooks.py`` (IterationTimer :85, PeriodicWriter :157,
PeriodicCheckpointer :191, BestCheckpointer :210, LRScheduler :307,
EvalHook :502).
"""
from __future__ import annotations

import logging
import math
import time
from typing import Callable, List, Optional

from u2seg_tpu.engine.events import EventStorage

logger = logging.getLogger(__name__)


class HookBase:
    trainer = None  # set by TrainerBase.register_hooks

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass

    def state_dict(self):
        return {}

    def load_state_dict(self, state):
        pass


class IterationTimer(HookBase):
    def __init__(self, warmup_iter: int = 3):
        self._warmup = warmup_iter
        self._start = None
        self._step_start = None
        self._total = 0.0
        self._count = 0

    def before_train(self):
        self._start = time.perf_counter()

    def before_step(self):
        self._step_start = time.perf_counter()

    def after_step(self):
        dt = time.perf_counter() - self._step_start
        storage = self.trainer.storage
        if self.trainer.iter >= self.trainer.start_iter + self._warmup:
            storage.put_scalar("time", dt, smoothing_hint=True)
            self._total += dt
            self._count += 1

    def after_train(self):
        total = time.perf_counter() - self._start
        if self._count:
            logger.info(
                "Total training time: %.1fs (%.4f s/iter pure compute)",
                total, self._total / self._count,
            )


class PeriodicWriter(HookBase):
    def __init__(self, writers: List, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
            self.trainer.iter == self.trainer.max_iter - 1
        ):
            for w in self._writers:
                w.write(self.trainer.storage)

    def after_train(self):
        for w in self._writers:
            w.write(self.trainer.storage)
            w.close()


class PeriodicCheckpointer(HookBase):
    def __init__(self, checkpointer, period: int, max_to_keep: Optional[int] = None):
        self._ckptr = checkpointer
        self._period = period

    def after_step(self):
        it = self.trainer.iter
        if (it + 1) % self._period == 0 or it == self.trainer.max_iter - 1:
            self._ckptr.save(f"model_{it:07d}", self.trainer.save_state())


class BestCheckpointer(HookBase):
    """Save when a validation metric improves (ref hooks.py:210)."""

    def __init__(self, eval_period: int, checkpointer, val_metric: str,
                 mode: str = "max"):
        self._period = eval_period
        self._ckptr = checkpointer
        self._metric = val_metric
        self._mode = mode
        self._best: Optional[float] = None

    def after_step(self):
        it = self.trainer.iter
        if self._period <= 0 or (it + 1) % self._period != 0:
            return
        latest = self.trainer.storage.latest().get(self._metric)
        if latest is None:
            return
        value = latest[0]
        better = (
            self._best is None
            or (self._mode == "max" and value > self._best)
            or (self._mode == "min" and value < self._best)
        )
        if better:
            self._best = value
            self._ckptr.save("model_best", self.trainer.save_state())

    def state_dict(self):
        return {"best": self._best}

    def load_state_dict(self, state):
        self._best = state.get("best")


class LRLogger(HookBase):
    """Log the current LR from the schedule (scheduler itself lives inside
    the optax chain; this hook mirrors ref LRScheduler's bookkeeping)."""

    def __init__(self, schedule: Callable):
        self._schedule = schedule

    def after_step(self):
        self.trainer.storage.put_scalar(
            "lr", float(self._schedule(self.trainer.iter)), smoothing_hint=False
        )


class EvalHook(HookBase):
    def __init__(self, eval_period: int, eval_fn: Callable[[], dict],
                 eval_after_train: bool = True):
        self._period = eval_period
        self._fn = eval_fn
        self._after_train = eval_after_train

    def _do_eval(self):
        results = self._fn()
        if results:
            flat = flatten_results_dict(results)
            for k, v in flat.items():
                self.trainer.storage.put_scalar(k, v, smoothing_hint=False)

    def after_step(self):
        it = self.trainer.iter
        if self._period > 0 and (it + 1) % self._period == 0 and (
            it != self.trainer.max_iter - 1
        ):
            self._do_eval()

    def after_train(self):
        if self._after_train and self.trainer.iter + 1 >= self.trainer.max_iter:
            self._do_eval()


def flatten_results_dict(results: dict, prefix: str = "") -> dict:
    """ref evaluation/testing.py:68."""
    out = {}
    for k, v in results.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_results_dict(v, key))
        else:
            try:
                out[key] = float(v)
            except (TypeError, ValueError):
                pass
    return out


class ProfilerHook(HookBase):
    """jax.profiler trace window over selected iterations.

    Counterpart of ref ``TorchProfiler`` (engine/hooks.py:377): captures a
    device trace (viewable in TensorBoard / Perfetto) for iterations where
    ``enable_predicate(iter)`` is true."""

    def __init__(self, enable_predicate, output_dir: str):
        self._pred = enable_predicate
        self._dir = output_dir
        self._active = False

    def before_step(self):
        import jax

        if self._pred(self.trainer.iter) and not self._active:
            jax.profiler.start_trace(self._dir)
            self._active = True

    def after_step(self):
        import jax

        if self._active and not self._pred(self.trainer.iter + 1):
            jax.profiler.stop_trace()
            self._active = False
            logger.info("wrote profiler trace to %s", self._dir)

    def after_train(self):
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class MemoryStatsHook(HookBase):
    """Log device memory stats periodically (ref TorchMemoryStats :639)."""

    def __init__(self, period: int = 20):
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period:
            return
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats()
        except Exception:
            return
        if stats:
            in_use = stats.get("bytes_in_use", 0) / 2 ** 20
            peak = stats.get("peak_bytes_in_use", 0) / 2 ** 20
            self.trainer.storage.put_scalar("mem_mb", in_use,
                                            smoothing_hint=False)
            self.trainer.storage.put_scalar("peak_mem_mb", peak,
                                            smoothing_hint=False)
