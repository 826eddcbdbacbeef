"""Dissect one cascade box stage at the batch-8 bench workload.

Times, separately: the multilevel Pallas pool, the 2xFC box head on a
pre-pooled tensor, the predictor, and the composed stage — to locate the
gap between the sum of parts and the measured ~10.4 ms/stage.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.build import build_model

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    cfg = Config()
    model = build_model(cfg)
    b, h, w = int(os.environ.get("PROF_BATCH", "8")), 800, 1344
    k = cfg.model.rpn.post_nms_topk_test
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w]] * b, dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1], train=False
    )
    # realistic proposal boxes: mixed sizes
    xy = rng.rand(b, k, 2) * np.array([w * 0.8, h * 0.8])
    wh = np.exp(rng.rand(b, k, 2) * 5.5) + 8  # 9..250 px
    boxes = jnp.array(
        np.concatenate([xy, np.minimum(xy + wh, [w, h])], -1).astype(np.float32))

    def sync(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0]).sum()

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:30s} {dt*1000:8.2f} ms", flush=True)
        return dt

    m = model

    @jax.jit
    def f_feats(v, x):
        mm = m.bind(v)
        return mm.backbone(mm.normalize(x), train=False)

    feats = jax.block_until_ready(f_feats(variables, images))

    @jax.jit
    def f_pool(v, f, bx):
        rh = m.bind(v).roi_heads
        p = rh._pool(f, bx, 7, 0)
        return p.astype(jnp.float32).sum()

    @jax.jit
    def f_pool_out(v, f, bx):
        rh = m.bind(v).roi_heads
        return rh._pool(f, bx, 7, 0)

    pooled = jax.block_until_ready(f_pool_out(variables, feats, boxes))
    print("pooled:", pooled.shape, pooled.dtype, flush=True)

    @jax.jit
    def f_head(v, p):
        rh = m.bind(v).roi_heads
        x = rh.box_heads[0](p, train=False)
        s, d = rh.box_predictors[0](x)
        return s.sum() + d.sum()

    @jax.jit
    def f_stage(v, f, bx):
        rh = m.bind(v).roi_heads
        s, d = rh._run_stage(f, bx, 0, False)
        return s.sum() + d.sum()

    @jax.jit
    def f_stage_refine(v, f, bx, sz):
        rh = m.bind(v).roi_heads
        s, d = rh._run_stage(f, bx, 0, False)
        nb = rh._refine(d, bx, 0, sz)
        return s.sum() + nb.sum()

    timeit("pool 8x1000 @7x7 (sum)", f_pool, variables, feats, boxes)
    timeit("pool 8x1000 @7x7 (mat)", f_pool_out, variables, feats, boxes)
    timeit("box head+pred on pooled", f_head, variables, pooled)
    timeit("full stage (pool+head)", f_stage, variables, feats, boxes)
    timeit("stage + refine", f_stage_refine, variables, feats, boxes, sizes)


if __name__ == "__main__":
    main()
