"""Time the multilevel Pallas ROIAlign at the cascade workload:
4k ROIs, 7x7, FPN p2-p5 levels of the 800x1344 batch-4 bucket."""
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

    from u2seg_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    b, c = 4, 256
    dims = [(200, 336), (100, 168), (50, 84), (25, 42)]
    strides = (4, 8, 16, 32)
    rng = np.random.RandomState(0)
    feats = [jnp.array(rng.randn(b, h, w, c).astype(np.float32),
                       dtype=jnp.bfloat16) for h, w in dims]
    n_roi = 4000
    # realistic box-size distribution: log-uniform sqrt-areas 32..640px
    sa = np.exp(rng.uniform(np.log(32), np.log(640), n_roi))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), n_roi))
    bw = sa * np.sqrt(ar)
    bh = sa / np.sqrt(ar)
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

    fn = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx, bi, 7, strides, sampling_ratio=2))
    out = fn(feats, boxes, bidx)
    sync(out)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(feats, boxes, bidx)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"multilevel pool 4k ROIs 7x7: {dt * 1e3:.2f} ms", flush=True)

    # mask-head workload: 400 ROIs at 14x14
    fn2 = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx[:400], bi[:400], 14, strides, sampling_ratio=2))
    out = fn2(feats, boxes, bidx)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn2(feats, boxes, bidx)
    sync(out)
    print(f"multilevel pool 400 ROIs 14x14: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
