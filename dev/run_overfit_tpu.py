"""Run the learning-sanity (overfit) check on the REAL TPU and record the
loss curve to artifacts/overfit_tpu.json.

Same assertions as tests/engine/test_overfit.py (which is CPU-bound and
env-gated because it costs ~30 CPU-minutes): SPMD train steps on one fixed
synthetic batch must cut the total loss by >20% and drive the RPN
objectness loss below 0.5 (lr 0.08, 150 steps — measured: 0.69 -> ~0.26).
The total-loss floor is set by the deliberately-unlearnable parts of the
synthetic batch: random per-pixel sem-seg labels floor loss_sem_seg at
ln(5)/2 = 0.80 and random GT masks floor loss_mask at ln(2) = 0.69, both
observed exactly — the learnable components (RPN, cascade cls/reg) drop
5-10x.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("devices:", jax.devices(), flush=True)

    from u2seg_tpu.config.testing import tiny_batch, tiny_spmd_config
    from u2seg_tpu.engine.trainer import create_train_state, make_train_step
    from u2seg_tpu.parallel.mesh import create_mesh, replicated
    from u2seg_tpu.solver import build_optimizer

    cfg = tiny_spmd_config()
    cfg.solver.base_lr = 0.08
    cfg.solver.warmup_iters = 2
    mesh = create_mesh()
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    tx = build_optimizer(cfg.solver)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, mesh, donate=False)

    losses, rpn_cls = [], []
    key = jax.random.PRNGKey(7)
    t0 = time.time()
    n_steps = int(os.environ.get("U2SEG_OVERFIT_STEPS", "150"))
    for i in range(n_steps):
        state, metrics = step(state, batch, key)
        losses.append(float(np.asarray(metrics["total_loss"])))
        rpn_cls.append(float(np.asarray(metrics["loss_rpn_cls"])))
        print(f"step {i:2d}: total={losses[-1]:.4f} rpn_cls={rpn_cls[-1]:.4f}",
              flush=True)
    wall = time.time() - t0

    first = float(np.mean(losses[:5]))
    last = float(np.mean(losses[-5:]))
    ok = (np.isfinite(losses).all() and last < first * 0.8
          and rpn_cls[-1] < 0.5)
    out = {
        "device": str(jax.devices()[0]),
        "steps": len(losses),
        "total_loss": losses,
        "loss_rpn_cls": rpn_cls,
        "first5_mean": first,
        "last5_mean": last,
        "wall_s": round(wall, 1),
        "ok": bool(ok),
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "artifacts"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "overfit_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("total_loss", "loss_rpn_cls")}))
    assert ok, f"overfit check failed: {first:.3f} -> {last:.3f}"


if __name__ == "__main__":
    main()
