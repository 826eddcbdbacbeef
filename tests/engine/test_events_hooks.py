import json
import os

import numpy as np

from u2seg_tpu.engine.events import (
    CommonMetricPrinter, EventStorage, JSONWriter, get_event_storage,
)
from u2seg_tpu.engine import hooks as hooks_lib
from u2seg_tpu.engine.train_loop import TrainerBase
from u2seg_tpu.solver import build_lr_schedule, multistep_schedule
from u2seg_tpu.config.config import SolverConfig


def test_event_storage_scalars():
    with EventStorage(0) as s:
        assert get_event_storage() is s
        for i in range(30):
            s.put_scalar("loss", float(i), smoothing_hint=True)
            s.step()
        h = s.history("loss")
        assert h.latest() == 29.0
        assert 15 <= h.median(20) <= 25


def test_json_writer(tmp_path):
    path = str(tmp_path / "metrics.json")
    w = JSONWriter(path, window_size=1)
    with EventStorage(0) as s:
        s.put_scalar("loss", 1.5, smoothing_hint=False)
        w.write(s)
        s.step()
        s.put_scalar("loss", 2.5, smoothing_hint=False)
        w.write(s)
    w.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[0]["iteration"] == 0
    assert lines[1]["loss"] == 2.5


class _FakeTrainer(TrainerBase):
    def __init__(self):
        super().__init__()
        self.steps_run = 0

    def run_step(self):
        self.storage.put_scalar("loss", 10.0 / (self.iter + 1))
        self.steps_run += 1


def test_trainer_base_hook_order():
    order = []

    class Recorder(hooks_lib.HookBase):
        def before_train(self):
            order.append("before_train")

        def before_step(self):
            order.append(f"before_{self.trainer.iter}")

        def after_step(self):
            order.append(f"after_{self.trainer.iter}")

        def after_train(self):
            order.append("after_train")

    t = _FakeTrainer()
    t.register_hooks([Recorder()])
    t.train(0, 3)
    assert order == [
        "before_train", "before_0", "after_0", "before_1", "after_1",
        "before_2", "after_2", "after_train",
    ]
    assert t.steps_run == 3


def test_eval_hook_periodic():
    calls = []
    t = _FakeTrainer()
    t.register_hooks([
        hooks_lib.EvalHook(2, lambda: calls.append(1) or {"m": {"x": 1.0}}),
    ])
    t.train(0, 6)
    # iters 1, 3 fire periodically; iter 5 is final -> after_train fires
    assert len(calls) == 3


def test_multistep_schedule_values():
    sched = multistep_schedule(
        base_lr=0.01, steps=(10, 20), gamma=0.1,
        warmup_iters=5, warmup_factor=0.2,
    )
    assert abs(float(sched(0)) - 0.01 * 0.2) < 1e-9
    assert abs(float(sched(5)) - 0.01) < 1e-9
    assert abs(float(sched(9)) - 0.01) < 1e-9
    assert abs(float(sched(10)) - 0.001) < 1e-9
    assert abs(float(sched(25)) - 0.0001) < 1e-9


def test_u2seg_schedule_from_config():
    cfg = SolverConfig()
    sched = build_lr_schedule(cfg)
    # warmup: factor 1/1000 at iter 0
    assert abs(float(sched(0)) - 0.01 / 1000) < 1e-9
    assert abs(float(sched(1000)) - 0.01) < 1e-8
    assert abs(float(sched(210000)) - 0.01 * 0.02) < 1e-9
    assert abs(float(sched(250000)) - 0.01 * 0.02 * 0.02) < 1e-10


def test_flatten_results_dict():
    out = hooks_lib.flatten_results_dict({"a": {"b": 1.0, "c": {"d": 2}}, "e": 3})
    assert out == {"a/b": 1.0, "a/c/d": 2.0, "e": 3.0}
