"""NMS tile-size sweep + fast_rcnn_inference component split on TPU."""
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

    from u2seg_tpu.ops.nms import nms

    b, h, w = 4, 800, 1344
    m = 2048
    rng = np.random.RandomState(0)

    def rand_boxes(n):
        cx = rng.rand(n) * w
        cy = rng.rand(n) * h
        sz = np.exp(rng.rand(n) * np.log(600 / 16)) * 16
        ar = np.exp(rng.randn(n) * 0.4)
        bw, bh = sz * ar, sz / ar
        return np.stack([
            np.clip(cx - bw / 2, 0, w), np.clip(cy - bh / 2, 0, h),
            np.clip(cx + bw / 2, 0, w), np.clip(cy + bh / 2, 0, h)],
            -1).astype(np.float32)

    boxes = jnp.array(np.stack([rand_boxes(m) for _ in range(b)]))
    scores = jnp.array(rng.rand(b, m).astype(np.float32))

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

    ref_keep = None
    for tile in (128, 256, 512, 1024, 2048):
        f = jax.jit(jax.vmap(
            lambda bx, sc, t=tile: nms(bx, sc, 0.5, 100, tile=t)))
        keep, valid = f(boxes, scores)
        if ref_keep is None:
            ref_keep = np.asarray(keep), np.asarray(valid)
        else:
            np.testing.assert_array_equal(np.asarray(keep), ref_keep[0],
                                          err_msg=f"tile {tile}")
        timeit(f"nms 2048 cands tile={tile}", lambda bx, sc: f(bx, sc)[0].sum(),
               boxes, scores)

    # approx_max_k cost over K*C candidates
    flat = jnp.array(rng.rand(b, 1000 * 800).astype(np.float32))
    amk = jax.jit(lambda x: jax.lax.approx_max_k(x, m, recall_target=0.99)[0].sum())
    timeit("approx_max_k 800k -> 2048", amk, flat)
    tk = jax.jit(lambda x: jax.lax.top_k(x, m)[0].sum())
    timeit("exact top_k 800k -> 2048", tk, flat)


if __name__ == "__main__":
    main()
