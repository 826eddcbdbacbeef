"""Sweep the multilevel-pool group size (U2SEG_POOL_GSZ) at the bench
workload to distinguish DMA-bound from per-step-overhead-bound.

If ms scales ~1/g -> per-step compute/overhead dominates; if flat -> DMA.
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

    from u2seg_tpu.ops import roi_align_pallas as rap

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    b, k = 8, 1000
    rng = np.random.RandomState(0)
    # FPN pyramid at 800x1344
    shapes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = [
        jnp.array(rng.rand(b, h, w, 256).astype(np.float32), jnp.bfloat16)
        for h, w in shapes
    ]
    xy = rng.rand(b * k, 2) * np.array([1344 * 0.8, 800 * 0.8])
    wh = np.exp(rng.rand(b * k, 2) * 5.5) + 8
    boxes = jnp.array(np.concatenate(
        [xy, np.minimum(xy + wh, [1344, 800])], -1).astype(np.float32))
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)

    def run(g):
        os.environ["U2SEG_POOL_GSZ"] = str(g)

        @jax.jit
        def f(fs, bx, bi):
            return rap.multilevel_roi_align_pallas(
                fs, bx, bi, 7, (4, 8, 16, 32), sampling_ratio=0,
                out_dtype=jnp.bfloat16,
            ).astype(jnp.float32).sum()

        try:
            out = f(feats, boxes, bidx)
            out.block_until_ready()
        except Exception as e:
            print(f"g={g}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(feats, boxes, bidx)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"g={g:3d}  {dt*1000:8.2f} ms  ({dt*1e6/ (b*k//g):.2f} us/step)",
              flush=True)

    for g in (4, 8, 10, 16):
        run(g)


if __name__ == "__main__":
    main()
