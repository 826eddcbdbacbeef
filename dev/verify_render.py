"""Verify driver: full-res panoptic render fed by a real-TPU model forward.

Runs the flagship PanopticFPN forward (combine=False) on the TPU at a
moderate static shape, then exercises the new host-side exact renderer
(engine/panoptic_render.py) end-to-end, including a degenerate no-valid-
detections probe.
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
    print("platform:", jax.devices()[0].platform, flush=True)

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.panoptic_render import render_panoptic_output
    from u2seg_tpu.models.build import build_model

    cfg = Config()
    model = build_model(cfg)
    b, h, w = 1, 512, 832
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[480, 800]] * b, dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, sizes, train=False
    )
    t0 = time.time()
    out = jax.jit(
        lambda v, x, s: model.apply(v, x, s, train=False, combine=False)
    )(variables, images, sizes)
    jax.block_until_ready(out.detections.boxes)
    print(f"forward ok in {time.time()-t0:.1f}s", flush=True)

    det = out.detections
    boxes = np.asarray(det.boxes[0])
    scores = np.asarray(det.scores[0])
    classes = np.asarray(det.classes[0])
    valid = np.asarray(det.valid[0])
    ml = np.asarray(det.mask_logits[0])
    sem_logits = np.asarray(out.sem_seg_logits[0])
    print("valid dets:", int(valid.sum()), "sem_logits:", sem_logits.shape,
          flush=True)

    pc = cfg.model.panoptic
    t0 = time.time()
    sem, pan, segs = render_panoptic_output(
        boxes, scores, classes, valid, ml, sem_logits,
        (480, 800), (375, 625),
        instance_conf_thresh=pc.instance_conf_thresh,
        overlap_thresh=pc.overlap_thresh,
        stuff_area_limit=pc.stuff_area_limit,
    )
    print(f"render ok in {time.time()-t0:.2f}s: sem {sem.shape} "
          f"pan {pan.shape} ids {np.unique(pan)[:8]} segs {len(segs)}",
          flush=True)
    assert sem.shape == (375, 625) and pan.shape == (375, 625)
    n_seg = len(segs)
    assert sorted(np.unique(pan).tolist()) == sorted({0, *range(1, n_seg + 1)} if n_seg else {0}) or \
        set(np.unique(pan)).issubset({0, *range(1, n_seg + 1)})
    for s in segs:
        assert (pan == s["id"]).sum() > 0

    # degenerate probe: no valid detections at all
    sem2, pan2, segs2 = render_panoptic_output(
        boxes, scores, classes, np.zeros_like(valid), ml, sem_logits,
        (480, 800), (375, 625),
        instance_conf_thresh=pc.instance_conf_thresh,
        overlap_thresh=pc.overlap_thresh,
        stuff_area_limit=pc.stuff_area_limit,
    )
    assert all(not s["isthing"] for s in segs2)
    print("degenerate (no dets) ok: segs =", len(segs2), flush=True)
    print("VERIFY PASS", flush=True)


if __name__ == "__main__":
    main()
