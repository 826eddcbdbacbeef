"""Verify driver: run_batched packed-RLE fetch on the real TPU.

Exercises the changed drain path at the package boundary with degenerate
inputs the e2e bench does not hit:
  - an image larger than the render canvas -> device fallback flag -> exact
    host re-render,
  - an image too large for every raw bucket -> host-resize dispatch path,
  - a tail group (stream length not a multiple of the batch size).
Asserts each result has the full panoptic structure and that the non-
fallback results bit-match the single-image host-render predictor path.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    cfg = Config()
    rng = np.random.RandomState(0)

    def blob(h, w):
        import cv2

        base = rng.rand(24, 32, 3).astype(np.float32)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        return (img * 255).clip(0, 255).astype(np.uint8)

    images = [
        blob(480, 640),   # normal raw-bucket image
        blob(700, 900),   # oh > 640 canvas -> device fallback -> host render
        blob(480, 640),
        blob(1500, 2000), # exceeds every raw bucket -> host-resize dispatch
        blob(480, 640),   # tail group of the 480x640 bucket (3 of bs=8)
    ]
    predictor = DefaultPredictor(cfg)
    results = {}
    for meta, out in predictor.run_batched(
        ((i, im) for i, im in enumerate(images)),
        batch_size=cfg.test.ims_per_batch,
        device_render=True, device_resize=True,
    ):
        results[meta] = out
    assert sorted(results) == list(range(len(images))), sorted(results)
    for i, im in enumerate(images):
        out = results[i]
        assert out["panoptic"].shape == im.shape[:2], (i, out["panoptic"].shape)
        assert out["sem_seg"].shape == im.shape[:2]
        assert isinstance(out["segments"], list)
        print(f"img{i} {im.shape[:2]}: {len(out['segments'])} segments, "
              f"{len(out['instances']['scores'])} dets", flush=True)

    # bit-parity of the packed-fetch path vs the single-image host render
    ref = predictor(images[0])
    np.testing.assert_array_equal(results[0]["panoptic"], ref["panoptic"])
    np.testing.assert_array_equal(results[0]["sem_seg"], ref["sem_seg"])
    assert len(results[0]["segments"]) == len(ref["segments"])
    print("packed-fetch path == single-image host render: OK", flush=True)


if __name__ == "__main__":
    main()
