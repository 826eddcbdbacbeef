"""Micro-profile of panoptic fusion parts at the eval bucket shape."""
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

    from u2seg_tpu.models.panoptic_fpn import combine_semantic_and_instance
    from u2seg_tpu.ops.mask_paste import paste_masks
    from u2seg_tpu.structures.instances import Detections

    b, k, hs, ws = 8, 100, 200, 336
    num_stuff = 28
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, k, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 1200, (b, k))
    boxes[..., 1] = rng.uniform(0, 700, (b, k))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(20, 400, (b, k))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(20, 300, (b, k))
    det = Detections(
        boxes=jnp.array(boxes),
        scores=jnp.array(rng.uniform(0, 1, (b, k)).astype(np.float32)),
        classes=jnp.array(rng.randint(0, 800, (b, k)), jnp.int32),
        valid=jnp.ones((b, k), bool),
        mask_logits=jnp.array(rng.randn(b, k, 28, 28).astype(np.float32)),
    )
    sem_logits = jnp.array(rng.randn(b, hs, ws, num_stuff).astype(np.float32))
    sizes = jnp.array([[800, 1344]] * b, jnp.int32)

    red = jax.jit(lambda o: sum(x.astype(jnp.float32).sum()
                                for x in jax.tree_util.tree_leaves(o)))

    def sync(o):
        return float(red(o))

    def timed(name, fn, *a, iters=20):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        sync(out)
        print(f"{name:30s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
              flush=True)

    timed("full fusion", jax.jit(
        lambda d, s, z: combine_semantic_and_instance(d, s, z)),
        det, sem_logits, sizes)

    # paste alone (sorted order ignored; same volume)
    def paste_only(d):
        def per(bx, ml):
            return paste_masks(jax.nn.sigmoid(ml), bx / 4.0, hs, ws) > 0.5
        return jax.vmap(per)(d.boxes, d.mask_logits)
    timed("paste_masks (400 ROIs)", jax.jit(paste_only), det)

    # argsort + sigmoid only
    timed("argsort", jax.jit(
        lambda d: jax.vmap(lambda s, v: jnp.argsort(-jnp.where(v, s, -jnp.inf)))(
            d.scores, d.valid)), det)


if __name__ == "__main__":
    main()
