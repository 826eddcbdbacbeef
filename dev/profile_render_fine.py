"""Fine-grained device-render decomposition: time the FULL render_batch,
then variants with individual stages stubbed out (sem chain, paste, paint
scan, winner map, stuff, RLE, pack) to locate the residual cost that the
piecewise benchmarks in profile_render.py do not see."""
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

    b, k, m, c = 8, 50, 28, 28
    h4, w4 = 200, 336
    canvas = (640, 640)
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
        return float(np.asarray(
            jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])

    def full(*a):
        r = dr.render_batch(
            type("D", (), {"boxes": a[0], "scores": a[1], "classes": a[2],
                           "valid": a[3], "mask_logits": a[4]})(),
            a[5], a[6], a[7], canvas=canvas, k_fuse=k, max_runs=16384)
        return dr.pack_rendered_batch(r, prefix=b * 2048)

    def bench(name, *a):
        f = jax.jit(full)
        sync(f(*a))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / iters / b * 1e3
        print(f"{name:34s} {dt:7.2f} ms/img", flush=True)
        return dt

    bench("FULL (incl pack)", *args)

    # stub RLE
    orig_rle = dr.rle_encode
    dr.rle_encode = lambda flat, mr: (
        jnp.zeros((mr,), jnp.int32), jnp.zeros((mr,), jnp.int32),
        (jnp.sum(flat) * 0 + 1).astype(jnp.int32))
    bench("- rle_encode", *args)
    dr.rle_encode = orig_rle

    # stub paste (zeros)
    orig_paste = dr.paste_masks
    dr.paste_masks = lambda msk, bx, oh, ow, precision=None: jnp.zeros(
        (msk.shape[0], oh, ow), jnp.float32)
    bench("- paste", *args)
    dr.paste_masks = orig_paste

    # stub sem weights to identity-ish (kills the two matmuls' cost? no —
    # kill the whole sem chain by zero weights)
    orig_w = dr.sem_resize_weights
    dr.sem_resize_weights = lambda o, s4, st, iv, ov: jnp.zeros(
        (o, s4), jnp.float32)
    bench("- sem weights (mm stays)", *args)
    dr.sem_resize_weights = orig_w

    # stub the paint scan: take everything eligible, claimed = zeros
    import u2seg_tpu.engine.device_render as drm
    src_scan = jax.lax.scan

    def fake_scan(f, init, xs, **kw):
        if isinstance(init, jnp.ndarray) and init.dtype == jnp.bool_ \
                and init.ndim == 2:
            masks, elig, area = xs
            return init, elig
        return src_scan(f, init, xs, **kw)

    jax.lax.scan = fake_scan
    try:
        bench("- paint scan", *args)
    finally:
        jax.lax.scan = src_scan


if __name__ == "__main__":
    main()
