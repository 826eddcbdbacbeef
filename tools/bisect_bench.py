#!/usr/bin/env python
"""Stage-wise timing of the PanopticFPN inference pipeline on the current
device: backbone -> +sem-seg -> +RPN(NMS) -> +cascade heads -> +mask ->
+fusion. Each stage is its own jitted function, timed by queueing N
executions and syncing once (tunnel-safe).

Usage: python tools/bisect_bench.py [--batch 4] [--height 800] [--width 1344]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--height", type=int, default=800)
    parser.add_argument("--width", type=int, default=1344)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--num-classes", type=int, default=800)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.panoptic_fpn import (
        PanopticFPN, combine_semantic_and_instance,
    )

    cfg = Config()
    cfg.model.roi_heads.num_classes = args.num_classes
    model = PanopticFPN(cfg.model)
    b, h, w = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w]] * b, jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           images[:1], sizes[:1], train=False)

    def sync(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0]).sum()

    def timed(name, fn, *fn_args):
        out = fn(*fn_args)            # compile + warm
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fn_args)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:9.1f} ms/batch "
              f"({args.batch / dt:7.1f} img/s)", flush=True)
        return out

    # stage fns — outputs reduced ON DEVICE so sync() transfers one scalar
    # (fetching a full feature map through the tunnel would dominate timing)
    @jax.jit
    def backbone_only(v, im):
        x = model.apply(v, im, method=lambda m, i: m.backbone(m.normalize(i)))
        return jnp.float32(sum(jnp.sum(t.astype(jnp.float32)) for t in x.values()))

    @jax.jit
    def bb_semseg(v, im):
        def f(m, i):
            feats = m.backbone(m.normalize(i))
            logits, _ = m.sem_seg_head(feats)
            return logits
        return jnp.sum(model.apply(v, im, method=f))

    @jax.jit
    def bb_rpn(v, im, sz):
        def f(m, i, s):
            feats = m.backbone(m.normalize(i))
            out = m.proposal_generator(feats, s)
            return out.proposal_boxes
        return jnp.sum(model.apply(v, im, sz, method=f))

    @jax.jit
    def full_no_fusion(v, im, sz):
        out = model.apply(v, im, sz, train=False, combine=False)
        return jnp.sum(out.detections.boxes)

    @jax.jit
    def full_fusion(v, im, sz):
        out = model.apply(v, im, sz, train=False, combine=True)
        return jnp.sum(out.panoptic)

    timed("backbone", backbone_only, variables, images)
    timed("backbone+semseg", bb_semseg, variables, images)
    timed("backbone+rpn(nms)", bb_rpn, variables, images, sizes)
    timed("full (no fusion)", full_no_fusion, variables, images, sizes)
    timed("full (+fusion)", full_fusion, variables, images, sizes)


if __name__ == "__main__":
    main()
