"""Time the adaptive-tier multilevel Pallas ROIAlign at the batch-8 cascade
workload (8000 ROIs, 7x7, bf16 out) and the mask workload (800 ROIs, 14x14),
and check it against the XLA gather reference."""
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
    print("device:", jax.devices()[0].device_kind, flush=True)

    from u2seg_tpu.ops.roi_align import multilevel_roi_align
    from u2seg_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    b, c = 8, 256
    dims = [(200, 336), (100, 168), (50, 84), (25, 42)]
    strides = (4, 8, 16, 32)
    rng = np.random.RandomState(0)
    feats = [jnp.array(rng.randn(b, h, w, c).astype(np.float32),
                       dtype=jnp.bfloat16) for h, w in dims]
    n_roi = 8000
    sa = np.exp(rng.uniform(np.log(32), np.log(640), n_roi))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), n_roi))
    bw, bh = sa * np.sqrt(ar), sa / np.sqrt(ar)
    cx = rng.uniform(0, 1344, n_roi)
    cy = rng.uniform(0, 800, n_roi)
    boxes = jnp.array(np.stack([
        np.clip(cx - bw / 2, 0, 1344), np.clip(cy - bh / 2, 0, 800),
        np.clip(cx + bw / 2, 0, 1344), np.clip(cy + bh / 2, 0, 800),
    ], axis=1).astype(np.float32))
    bidx = jnp.array(rng.randint(0, b, n_roi), jnp.int32)

    red = jax.jit(lambda o: o.astype(jnp.float32).sum())

    def sync(o):
        return float(red(o))

    def timeit(name, fn, *a, iters=20):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        sync(out)
        print(f"{name:40s} {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
              flush=True)

    fn = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx, bi, 7, strides, sampling_ratio=0, out_dtype=jnp.bfloat16))
    timeit("pallas pool 8k ROIs 7x7", fn, feats, boxes, bidx)

    # exactness vs the pure-JAX replica (same window-fit/virtual-level
    # routing; the plain gather pooler deviates BY DESIGN on giant boxes)
    from u2seg_tpu.ops.roi_align_pallas import multilevel_roi_align_ref

    feats32 = [f.astype(jnp.float32) for f in feats]
    a = jax.jit(lambda f: multilevel_roi_align_pallas(
        f, boxes, bidx, 7, strides, sampling_ratio=0))(feats32)
    ref = jax.jit(lambda f: multilevel_roi_align_ref(
        f, boxes, bidx, 7, strides, 0))(feats32)
    diff = float(jnp.max(jnp.abs(a - ref)))
    print("max |pallas - replica| =", diff, flush=True)

    fn2 = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx[:800], bi[:800], 14, strides, sampling_ratio=0,
        out_dtype=jnp.bfloat16))
    timeit("pallas pool 800 ROIs 14x14", fn2, feats, boxes, bidx)


if __name__ == "__main__":
    main()
