"""SPMD train-step test on the virtual 8-device CPU mesh.

Uses the canonical tiny SPMD config (config.testing) — identical to the
driver's ``dryrun_multichip`` — so all heavy compiles share one persistent
cache entry.
"""
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)
import numpy as np
import jax

from u2seg_tpu.config.testing import tiny_batch, tiny_spmd_config
from u2seg_tpu.engine.trainer import create_train_state, make_train_step
from u2seg_tpu.parallel.mesh import create_mesh
from u2seg_tpu.solver import build_optimizer


@pytest.mark.xslow  # ~3 min CPU: full SPMD train-step compile
def test_train_step_runs_updates_and_replicates(rng):
    assert len(jax.devices()) == 8
    cfg = tiny_spmd_config()
    mesh = create_mesh()
    batch = tiny_batch(rng)
    tx = build_optimizer(cfg.solver)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    # replicate up front: otherwise call 2 recompiles for the new sharding
    from u2seg_tpu.parallel.mesh import replicated

    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, mesh, donate=False)

    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k}: {v}"
    expected = {
        "loss_sem_seg", "loss_rpn_cls", "loss_rpn_loc", "loss_mask",
        "total_loss",
    } | {f"loss_cls_stage{i}" for i in range(3)} \
      | {f"loss_box_reg_stage{i}" for i in range(3)}
    assert set(metrics) == expected

    state2, _ = step(state1, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 2
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))

    # replica consistency: params identical on every device after psum'd grads
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    arrs = [np.asarray(s.data) for s in leaf.addressable_shards]
    for a in arrs[1:]:
        np.testing.assert_array_equal(arrs[0], a)
