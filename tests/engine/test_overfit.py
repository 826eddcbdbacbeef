"""Learning sanity: the SPMD train step reduces loss on a fixed batch.
(The counterpart of the reference's training_acc quick-schedule checks,
scaled to CI: 30 steps on one synthetic batch must cut total loss.)"""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)

from u2seg_tpu.config.testing import tiny_batch, tiny_spmd_config
from u2seg_tpu.engine.trainer import create_train_state, make_train_step
from u2seg_tpu.parallel.mesh import create_mesh
from u2seg_tpu.solver import build_optimizer


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("U2SEG_RUN_SLOW"),
    reason="~30 CPU-minutes on the 1-core dev host; set U2SEG_RUN_SLOW=1",
)
def test_loss_decreases_on_fixed_batch(rng):
    cfg = tiny_spmd_config()
    cfg.solver.base_lr = 0.02
    cfg.solver.warmup_iters = 2
    mesh = create_mesh()
    batch = tiny_batch(rng)
    tx = build_optimizer(cfg.solver)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    from u2seg_tpu.parallel.mesh import replicated

    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, mesh, donate=False)

    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(20):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["total_loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.8, f"loss did not decrease: {first:.3f} -> {last:.3f}"
    # rpn objectness (pure binary task on fixed data) must clearly improve
    assert float(metrics["loss_rpn_cls"]) < 0.5
