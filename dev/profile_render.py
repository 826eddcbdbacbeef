"""Per-stage timing of the on-device full-res render (device_render.py):
sem chain / paste / fusion / stuff+ids / RLE, each measured incrementally
at the production shapes (batch 8, canvas 640x640, K=50, C=28)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("dev:", jax.devices(), flush=True)

    from u2seg_tpu.engine import device_render as dr
    from u2seg_tpu.ops.mask_paste import paste_masks

    b, k, m, c = 8, 50, 28, 28
    h4, w4 = 200, 336
    canvas = (640, 640)
    oh_c, ow_c = canvas
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, k, 4), np.float32)
    xy = rng.rand(b, k, 2) * 400
    wh = rng.rand(b, k, 2) * 200 + 10
    boxes[..., :2] = xy
    boxes[..., 2:] = np.minimum(xy + wh, 640)
    scores = rng.rand(b, k).astype(np.float32)
    classes = rng.randint(0, 800, (b, k)).astype(np.int32)
    valid = np.ones((b, k), bool)
    mask_logits = rng.randn(b, k, m, m).astype(np.float32) * 4
    sem_logits = rng.randn(b, h4, w4, c).astype(np.float32) * 3
    ihw = np.tile([[800, 1067]], (b, 1)).astype(np.int32)
    ohw = np.tile([[480, 640]], (b, 1)).astype(np.int32)

    args = tuple(map(jnp.asarray, (
        boxes, scores, classes, valid, mask_logits, sem_logits, ihw, ohw)))

    def sync(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])

    def bench(name, fn, *a):
        f = jax.jit(fn)
        sync(f(*a))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / iters / b * 1e3
        print(f"{name:28s} {dt:7.2f} ms/img", flush=True)
        return dt

    # 1. sem chain (weights + einsum + argmax)
    def sem_only(sem_logits, ihw, ohw):
        def one(a):
            sl, hw, ohw_ = a
            wy = dr.sem_resize_weights(oh_c, h4, 4, hw[0], ohw_[0])
            wx = dr.sem_resize_weights(ow_c, w4, 4, hw[1], ohw_[1])
            full = jnp.einsum("ip,pqc,jq->ijc", wy,
                              sl.astype(jnp.float32), wx,
                              precision=jax.lax.Precision.HIGHEST,
                              optimize=True)
            return jnp.argmax(full, -1).astype(jnp.int32)
        return jax.lax.map(one, (sem_logits, ihw, ohw))

    bench("sem chain (einsum+argmax)", sem_only, args[5], args[6], args[7])

    # 2. paste only
    def paste_only(boxes, mask_logits):
        def one(a):
            bx, ml = a
            return jnp.sum(paste_masks(
                jax.nn.sigmoid(ml.astype(jnp.float32)), bx, oh_c, ow_c,
                precision=jax.lax.Precision.HIGHEST) > 0.5, (1, 2))
        return jax.lax.map(one, (boxes, mask_logits))

    bench("paste (50 masks, thresh)", paste_only, args[0], args[4])

    # 3. full render (everything)
    def full(*a):
        return dr.render_batch(
            type("D", (), {"boxes": a[0], "scores": a[1], "classes": a[2],
                           "valid": a[3], "mask_logits": a[4]})(),
            a[5], a[6], a[7], canvas=canvas, k_fuse=k, max_runs=16384)

    bench("FULL render_batch", full, *args)

    # 4. full minus RLE (patch rle_encode to a cheap sum)
    orig = dr.rle_encode
    dr.rle_encode = lambda flat, mr: (
        jnp.zeros((mr,), jnp.int32), jnp.zeros((mr,), jnp.int32),
        jnp.sum(flat).astype(jnp.int32) * 0 + 1)
    bench("render minus RLE", full, *args)
    dr.rle_encode = orig


if __name__ == "__main__":
    main()
