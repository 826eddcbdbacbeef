"""Micro-benchmarks of the ROI-head internals on the real chip.

Isolates: multilevel ROIAlign pool (box 7x7 and mask 14x14), box-head FCs,
fast_rcnn_inference (approx_max_k + blocked NMS), mask head, panoptic fusion.
Synthetic inputs shaped exactly like the 800x1344 batch-4 eval bucket.
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.roi_heads import (
        FastRCNNConvFCHead, FastRCNNOutputLayers, MaskRCNNConvUpsampleHead,
        fast_rcnn_inference,
    )
    from u2seg_tpu.models.panoptic_fpn import combine_semantic_and_instance
    from u2seg_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas
    from u2seg_tpu.ops.roi_align import multilevel_roi_align
    from u2seg_tpu.structures.instances import Detections

    cfg = Config()
    b, h, w = 4, 800, 1344
    k = 1000                       # post-NMS proposals per image
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    # synthetic FPN pyramid p2-p5 (NHWC, bf16) — generated ON DEVICE: the
    # host version is ~275 MB of uploads, minutes on the dev tunnel
    strides = (4, 8, 16, 32)

    @jax.jit
    def _mk_feats(key):
        ks = jax.random.split(key, len(strides))
        return [jax.random.uniform(kk, (b, h // s, w // s, 256), dtype)
                for kk, s in zip(ks, strides)]

    feats = _mk_feats(jax.random.PRNGKey(0))
    jax.block_until_ready(feats)

    # realistic boxes: mixed scales
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
        return dt

    # --- pool 4000 ROIs at 7x7 (one cascade stage) ---
    pool_p = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx, bi, 7, strides, sampling_ratio=0).sum())
    timeit("pool 4k ROIs 7x7 (pallas)", pool_p, feats, flat_boxes, bidx)

    pool_g = jax.jit(lambda f, bx, bi: multilevel_roi_align(
        f, bx, bi, 7, strides, sampling_ratio=0).sum())
    timeit("pool 4k ROIs 7x7 (gather)", pool_g, feats, flat_boxes, bidx)

    # --- box head FCs on 4000 ROIs ---
    head = FastRCNNConvFCHead(num_conv=0, conv_dim=256, num_fc=2,
                              fc_dim=1024, dtype=dtype)
    pooled = jnp.array(rng.rand(n, 7, 7, 256).astype(np.float32), dtype)
    hv = head.init(jax.random.PRNGKey(0), pooled)
    pred = FastRCNNOutputLayers(cfg.model.roi_heads.num_classes, True,
                                dtype=dtype)
    xf = jnp.array(rng.rand(n, 1024).astype(np.float32), dtype)
    pv = pred.init(jax.random.PRNGKey(0), xf)

    @jax.jit
    def run_head(hv, pv, x):
        y = head.apply(hv, x)
        s, d = pred.apply(pv, y)
        return s.sum() + d.sum()

    timeit("box head 2FC+predict 4k ROIs", run_head, hv, pv, pooled)

    # --- fast_rcnn_inference (topk + NMS) ---
    probs = jax.nn.softmax(jnp.array(
        rng.randn(b, k, cfg.model.roi_heads.num_classes + 1).astype(np.float32)
        * 2), -1)
    pred_boxes = flat_boxes.reshape(b, k, 4)
    valid = jnp.ones((b, k), bool)
    sizes = jnp.array([[h, w]] * b, jnp.int32)
    def _fri(bx, pr, vl, sz):
        d = fast_rcnn_inference(bx, pr, vl, sz, 0.05, 0.5, 100)
        return d.boxes.sum() + d.scores.sum()
    fri = jax.jit(_fri)
    timeit("fast_rcnn_inference (topk+NMS)", fri, pred_boxes, probs, valid, sizes)

    # --- mask pool + head on 400 dets (class-selective predictor) ---
    det_boxes = flat_boxes.reshape(b, k, 4)[:, :100].reshape(-1, 4)
    det_bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), 100)
    mask_head = MaskRCNNConvUpsampleHead(
        num_classes=cfg.model.roi_heads.num_classes, dtype=dtype)
    mp = jnp.array(rng.rand(400, 14, 14, 256).astype(np.float32), dtype)
    mhv = mask_head.init(jax.random.PRNGKey(0), mp)
    cls_idx = jnp.array(rng.randint(0, 800, (400,)).astype(np.int32))

    pool_m = jax.jit(lambda f, bx, bi: multilevel_roi_align_pallas(
        f, bx, bi, 14, strides, sampling_ratio=0).sum())
    timeit("pool 400 ROIs 14x14 (pallas)", pool_m, feats, det_boxes, det_bidx)

    mh = jax.jit(lambda v, x, ci: mask_head.apply(v, x, class_idx=ci).sum())
    timeit("mask head 400 ROIs (selective)", mh, mhv, mp, cls_idx)
    mh_full = jax.jit(lambda v, x: mask_head.apply(v, x).sum())
    timeit("mask head 400 ROIs (full 800ch)", mh_full, mhv, mp)

    # --- panoptic fusion ---
    det = Detections(
        boxes=flat_boxes.reshape(b, k, 4)[:, :100],
        scores=jnp.array(rng.rand(b, 100).astype(np.float32)),
        classes=jnp.array(rng.randint(0, 800, (b, 100)).astype(np.int32)),
        valid=jnp.ones((b, 100), bool),
        mask_logits=jnp.array(rng.randn(b, 100, 28, 28).astype(np.float32)),
    )
    sem_logits = jnp.array(
        rng.randn(b, h // 4, w // 4, 28).astype(np.float32))
    def _fuse(d, sl, sz):
        out = combine_semantic_and_instance(d, sl, sz)
        return out[0].sum()
    fuse = jax.jit(_fuse)
    timeit("panoptic fusion (scan)", fuse, det, sem_logits, sizes)


if __name__ == "__main__":
    main()
