"""Post-rewrite check: pooled-weights + double-buffered Pallas pooler vs
gather reference (correctness on real TPU) and new timings."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    from u2seg_tpu.models.panoptic_fpn import combine_semantic_and_instance
    from u2seg_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_pallas,
        multilevel_roi_align_ref,
    )
    from u2seg_tpu.structures.instances import Detections

    b, h, w = 4, 800, 1344
    k = 1000
    rng = np.random.RandomState(0)
    strides = (4, 8, 16, 32)
    feats32 = [jnp.array(rng.rand(b, h // s, w // s, 256).astype(np.float32))
               for s in strides]
    feats = [f.astype(jnp.bfloat16) for f in feats32]

    n = b * k
    cx = rng.rand(n) * w
    cy = rng.rand(n) * h
    sz = np.exp(rng.rand(n) * np.log(600 / 16)) * 16
    ar = np.exp(rng.randn(n) * 0.4)
    bw, bh = sz * ar, sz / ar
    boxes = np.stack([
        np.clip(cx - bw / 2, 0, w), np.clip(cy - bh / 2, 0, h),
        np.clip(cx + bw / 2, 0, w), np.clip(cy + bh / 2, 0, h)], -1)
    flat_boxes = jnp.array(boxes.astype(np.float32))
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)

    # correctness on a subset (fetch 64 ROIs)
    sub_boxes, sub_bidx = flat_boxes[:64], bidx[:64]
    got = np.asarray(jax.jit(
        lambda f, bx, bi: multilevel_roi_align_pallas(
            f, bx, bi, 7, strides, sampling_ratio=0)
    )(feats, sub_boxes, sub_bidx))
    ref = np.asarray(jax.jit(
        lambda f, bx, bi: multilevel_roi_align_ref(
            f, bx, bi, 7, strides, sampling_ratio=0)
    )(feats, sub_boxes, sub_bidx))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    print("kernel vs gather rel err:", err, flush=True)
    assert err < 2e-2, err  # bf16 features, f32 math in both

    def sync(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0]).sum()

    def timeit(name, fn, *args, iters=10):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1000:8.2f} ms", flush=True)

    pool_p = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx, bi, 7, strides, sampling_ratio=0).sum())
    timeit("pool 4k ROIs 7x7 (pallas v2)", pool_p, feats, flat_boxes, bidx)

    det_boxes = flat_boxes.reshape(b, k, 4)[:, :100].reshape(-1, 4)
    det_bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), 100)
    pool_m = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx, bi, 14, strides, sampling_ratio=0).sum())
    timeit("pool 400 ROIs 14x14 (pallas v2)", pool_m, feats, det_boxes, det_bidx)

    det = Detections(
        boxes=flat_boxes.reshape(b, k, 4)[:, :100],
        scores=jnp.array(rng.rand(b, 100).astype(np.float32)),
        classes=jnp.array(rng.randint(0, 800, (b, 100)).astype(np.int32)),
        valid=jnp.ones((b, 100), bool),
        mask_logits=jnp.array(rng.randn(b, 100, 28, 28).astype(np.float32)),
    )
    sem_logits = jnp.array(rng.randn(b, h // 4, w // 4, 28).astype(np.float32))
    sizes = jnp.array([[h, w]] * b, jnp.int32)

    def _fuse(d, sl, sz):
        out = combine_semantic_and_instance(d, sl, sz)
        return out[0].sum()
    fuse = jax.jit(_fuse)
    timeit("panoptic fusion (fixpoint)", fuse, det, sem_logits, sizes)


if __name__ == "__main__":
    main()
