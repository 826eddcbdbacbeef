"""Stage-level timing of the end-to-end eval pipeline (bench_e2e path).

Prints per-stage ms/img for: prepare (host resize/pad), device forward
(dispatch+wait), fetch (device->host transfers), records (mask paste +
RLE), render (sem upsample + panoptic combine).
"""
from __future__ import annotations

import time

import numpy as np


def main(n_images=32):
    import cv2
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    bs = cfg.test.ims_per_batch
    rng = np.random.RandomState(0)
    base = rng.rand(n_images, 30, 40, 3).astype(np.float32)
    images = [
        (cv2.resize(base[i], (640, 480), interpolation=cv2.INTER_CUBIC)
         * 255).clip(0, 255).astype(np.uint8)
        for i in range(n_images)
    ]

    p = DefaultPredictor(cfg)
    t = {"prepare": 0.0, "forward": 0.0, "fetch": 0.0, "records": 0.0,
         "render": 0.0}

    # warmup/compile
    padded, hw, ohow = p._prepare(images[0])
    stack = jnp.asarray(np.stack([padded] * bs))
    sizes = jnp.asarray(np.array([hw] * bs, np.int32))
    out = p._fwd(p.variables, stack, sizes)
    jax.block_until_ready(out)
    d0, s0 = p._fetch_image(out, 0)
    p._post(d0, s0, tuple(hw), ohow)

    nb = n_images // bs
    for b in range(nb):
        t0 = time.perf_counter()
        prepped = [p._prepare(images[b * bs + i]) for i in range(bs)]
        stack = jnp.asarray(np.stack([q[0] for q in prepped]))
        sizes = jnp.asarray(np.array([q[1] for q in prepped], np.int32))
        t1 = time.perf_counter()
        out = p._fwd(p.variables, stack, sizes)
        jax.block_until_ready(out)
        # tunnel backends can return early; force one scalar fetch
        float(np.asarray(out.detections.scores[0, 0]))
        t2 = time.perf_counter()
        fetched = [p._fetch_image(out, i) for i in range(bs)]
        t3 = time.perf_counter()
        from u2seg_tpu.engine.predictor import detections_to_records

        recs = []
        for i in range(bs):
            d, s = fetched[i]
            recs.append(detections_to_records(
                d["boxes"], d["scores"], d["classes"], d["valid"],
                d.get("mask_logits"), tuple(prepped[i][1]), prepped[i][2]))
        t4 = time.perf_counter()
        from u2seg_tpu.engine.panoptic_render import render_panoptic_output

        for i in range(bs):
            d, s = fetched[i]
            render_panoptic_output(
                d["boxes"], d["scores"], d["classes"], d["valid"],
                d.get("mask_logits"), s, tuple(prepped[i][1]), prepped[i][2],
                instance_conf_thresh=cfg.model.panoptic.instance_conf_thresh,
                overlap_thresh=cfg.model.panoptic.overlap_thresh,
                stuff_area_limit=cfg.model.panoptic.stuff_area_limit)
        t5 = time.perf_counter()
        t["prepare"] += t1 - t0
        t["forward"] += t2 - t1
        t["fetch"] += t3 - t2
        t["records"] += t4 - t3
        t["render"] += t5 - t4

    n = nb * bs
    total = sum(t.values())
    for k, v in t.items():
        print(f"{k:8s} {v / n * 1000:8.1f} ms/img")
    print(f"{'TOTAL':8s} {total / n * 1000:8.1f} ms/img "
          f"({n / total:.2f} img/s serial)")


if __name__ == "__main__":
    main()
