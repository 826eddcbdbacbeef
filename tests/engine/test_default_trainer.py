"""DefaultTrainer integration: hooks, metrics, checkpoint save/resume on the
virtual CPU mesh (counterpart of ref tests/test_engine.py:180 resume test).
Uses the canonical tiny SPMD config/batch so the compiled step is shared
with test_train_step via the persistent cache."""
import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)

from u2seg_tpu.config.testing import tiny_batch, tiny_spmd_config
from u2seg_tpu.engine import hooks as hooks_lib
from u2seg_tpu.engine.train_loop import DefaultTrainer
from u2seg_tpu.parallel.mesh import create_mesh


def fake_loader(rng, n=100):
    while True:
        b = tiny_batch(rng)
        yield {
            "image": np.asarray(b.images),
            "image_size": np.asarray(b.image_sizes),
            "gt_boxes": np.asarray(b.gt.boxes),
            "gt_classes": np.asarray(b.gt.classes),
            "gt_valid": np.asarray(b.gt.valid),
            "gt_masks": np.asarray(b.gt.masks),
            "sem_seg": np.asarray(b.sem_seg),
        }


@pytest.mark.slow
@pytest.mark.xslow  # ~12 min CPU: full DefaultTrainer graph compile
def test_default_trainer_train_and_resume(tmp_path, rng):
    cfg = tiny_spmd_config()
    cfg.output_dir = str(tmp_path)
    cfg.solver.checkpoint_period = 2
    mesh = create_mesh()

    trainer = DefaultTrainer(cfg, fake_loader(rng), mesh=mesh)
    # swap the donated step for the cache-shared variant
    from u2seg_tpu.engine.trainer import make_train_step

    trainer.step_fn = make_train_step(trainer.model, trainer.tx, mesh,
                                      donate=False)
    trainer.register_hooks(trainer.build_hooks())
    trainer.train(max_iter=3)
    assert trainer.iter == 3
    assert trainer.checkpointer.has_checkpoint()
    assert os.path.exists(tmp_path / "metrics.json")
    # losses were recorded
    hist = trainer.storage.history("total_loss")
    assert np.isfinite(hist.latest())

    # resume: fresh trainer picks up the checkpoint and continues
    trainer2 = DefaultTrainer(cfg, fake_loader(rng), mesh=mesh)
    trainer2.step_fn = make_train_step(trainer2.model, trainer2.tx, mesh,
                                       donate=False)
    trainer2.register_hooks(trainer2.build_hooks())
    resumed = trainer2.resume_or_load(resume=True)
    assert resumed
    assert trainer2.start_iter == 3
    p_old = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p_new = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(p_old), np.asarray(p_new))
    trainer2.train(max_iter=5)
    assert trainer2.iter == 5
