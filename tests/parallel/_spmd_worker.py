"""Worker for the 2-process SPMD train-step test
(tests/parallel/test_spmd_two_process.py).

Usage:
  python _spmd_worker.py <coordinator_addr> <process_id> <num_processes> \
      <global_devices>

With num_processes == 1 it skips ``jax.distributed`` and runs the plain
single-process path (the same computation the driver dryrun executes) so
the test can compare the two metric dicts. The parent sets XLA_FLAGS with
``--xla_force_host_platform_device_count=<global/num_processes>``.
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    addr, pid, nproc, ndev = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=nproc, process_id=pid
        )
    try:  # never claim the single-client TPU tunnel
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from u2seg_tpu.config.testing import tiny_batch, tiny_spmd_config
    from u2seg_tpu.engine.trainer import create_train_state, make_train_step
    from u2seg_tpu.parallel.mesh import DATA_AXIS, create_mesh, replicated
    from u2seg_tpu.solver import build_optimizer

    assert jax.device_count() == ndev, (jax.device_count(), ndev)
    cfg = tiny_spmd_config()
    mesh = create_mesh(ndev)
    # identical global batch on every process (deterministic rng)
    batch = tiny_batch(np.random.RandomState(0), b=ndev)
    tx = build_optimizer(cfg.solver)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    key = jax.random.PRNGKey(1)

    if nproc > 1:
        from jax.experimental import multihost_utils as mhu

        per = ndev // nproc

        def to_global_data(x):
            local = np.asarray(x)[pid * per:(pid + 1) * per]
            return mhu.host_local_array_to_global_array(
                local, mesh, P(DATA_AXIS))

        def to_global_rep(x):
            return mhu.host_local_array_to_global_array(
                np.asarray(x), mesh, P())

        batch = jax.tree_util.tree_map(to_global_data, batch)
        state = jax.tree_util.tree_map(to_global_rep, state)
        key = to_global_rep(key)
    else:
        state = jax.device_put(state, replicated(mesh))

    step = make_train_step(model, tx, mesh, donate=False)
    new_state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)
    out = {k: float(np.asarray(jax.device_get(v)))
           for k, v in metrics.items()}
    out["_step"] = int(np.asarray(jax.device_get(new_state.step)))
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
