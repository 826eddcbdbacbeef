"""A/B the one-tier Pallas pooler's window size on a small-box workload.

Distinguishes bytes-bound vs DMA-count-bound: all boxes have span <= 12
cells at their canonical level, so a 24x16 window is exact for every ROI
(as is 40x32). If shrinking the window 2.6x in bytes barely moves the
time, the pool is DMA-issue-bound and the two-tier idea is dead; if it
scales with bytes, the tier overheads are what needs fixing.

Usage: U2SEG_WIN=24x16 python dev/profile_pool_win.py   (or 40x32)
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import u2seg_tpu.ops.roi_align_pallas as rap

    win = os.environ.get("U2SEG_WIN", "")
    if win:
        wx, wy = (int(v) for v in win.split("x"))
        rap.WIN, rap.WIN_Y = wx, wy
        rap.SPAN_BUDGET = min(wx - 11, wy - 4)
    print(f"device: {jax.devices()[0].device_kind}  WIN={rap.WIN}x{rap.WIN_Y} "
          f"budget={rap.SPAN_BUDGET}", flush=True)

    b, c = 8, 256
    dims = [(200, 336), (100, 168), (50, 84), (25, 42)]
    strides = (4, 8, 16, 32)
    rng = np.random.RandomState(0)
    feats = [jnp.array(rng.randn(b, h, w, c).astype(np.float32),
                       dtype=jnp.bfloat16) for h, w in dims]
    n_roi = 8000
    # spans <= budget at the canonical level for BOTH configs: sqrt-area
    # routing maps sqrt(wh) to ~[0.875, 1.75)*224/2^(4-l)*stride... simply:
    # sample sqrt-areas then cap the long side at 12 cells of the canonical
    # stride for that area.
    sa = np.exp(rng.uniform(np.log(32), np.log(640), n_roi))
    lvl = np.clip(np.floor(4 + np.log2(sa / 224 + 1e-8)), 2, 5)
    stride = 2.0 ** lvl
    side = np.minimum(sa, 12 * stride * 0.95)  # square, span <= 12 cells
    cx = rng.uniform(0, 1344, n_roi)
    cy = rng.uniform(0, 800, n_roi)
    boxes = jnp.array(np.stack([
        np.clip(cx - side / 2, 0, 1344), np.clip(cy - side / 2, 0, 800),
        np.clip(cx + side / 2, 0, 1344), np.clip(cy + side / 2, 0, 800),
    ], axis=1).astype(np.float32))
    bidx = jnp.array(rng.randint(0, b, n_roi), jnp.int32)

    fn = jax.jit(lambda f, bx, bi: rap.multilevel_roi_align_pallas(
        f, bx, bi, 7, strides, sampling_ratio=0, out_dtype=jnp.bfloat16))
    out = fn(feats, boxes, bidx)
    out.block_until_ready()
    print("checksum:", float(out.astype(jnp.float32).sum()), flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(feats, boxes, bidx)
        out.block_until_ready()
        print(f"pool 8k small ROIs: {(time.perf_counter()-t0)/20*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
