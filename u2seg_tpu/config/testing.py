"""Shared tiny configs & synthetic batches for tests and the driver dryrun.

One canonical small-but-complete SPMD config: tests/engine/test_train_step.py
and ``__graft_entry__.dryrun_multichip`` both use EXACTLY this config and
batch shapes so they share one compiled executable in the persistent
compilation cache (compiles of the full train graph take ~15 min on a
single-core CPU host — paying it once matters).
"""
from __future__ import annotations

import numpy as np

from u2seg_tpu.config.config import Config


def tiny_spmd_config() -> Config:
    """Small PanopticFPN with the U2Seg-representative pieces on: cascade
    heads, SyncBN (psum over the mesh), class-agnostic regression."""
    cfg = Config()
    m = cfg.model
    m.compute_dtype = "float32"   # CPU test mesh has no native bf16
    m.resnet.norm = "SyncBN"
    m.fpn.norm = "SyncBN"
    m.roi_heads.num_classes = 7
    m.roi_heads.batch_size_per_image = 32
    m.roi_heads.detections_per_image = 10
    m.sem_seg_head.num_classes = 5
    m.rpn.pre_nms_topk_train = 64
    m.rpn.post_nms_topk_train = 64
    m.rpn.pre_nms_topk_test = 64
    m.rpn.post_nms_topk_test = 32
    m.rpn.batch_size_per_image = 32
    cfg.solver.warmup_iters = 2
    return cfg


def tiny_batch(rng: np.random.RandomState, b: int = 8, h: int = 64,
               w: int = 64, g: int = 3, patch: int = 32):
    """Synthetic training batch matching ``tiny_spmd_config`` shapes."""
    import jax.numpy as jnp

    from u2seg_tpu.engine.trainer import Batch
    from u2seg_tpu.structures.instances import GtInstances

    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w]] * b, dtype=jnp.int32)
    xy = rng.rand(b, g, 2) * (h / 2)
    wh = rng.rand(b, g, 2) * (h / 3) + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    gt = GtInstances(
        boxes=jnp.array(boxes),
        classes=jnp.array(rng.randint(0, 7, (b, g)).astype(np.int32)),
        valid=jnp.ones((b, g), bool),
        masks=jnp.array((rng.rand(b, g, patch, patch) > 0.4).astype(np.float32)),
    )
    sem = jnp.array(rng.randint(0, 5, (b, h, w)).astype(np.int32))
    return Batch(images=images, image_sizes=sizes, gt=gt, sem_seg=sem)
