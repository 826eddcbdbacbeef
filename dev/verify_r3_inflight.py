"""Verify driver: run_batched e2e path on the real TPU (small N).

Exercises the same pipeline as bench.py's default e2e mode: host
prepare -> batched device forward -> fetches -> host full-res render,
plus a degenerate probe (solid-color image -> likely zero detections).
"""
import time

import numpy as np


def main():
    import cv2
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    bs = cfg.test.ims_per_batch
    rng = np.random.RandomState(0)
    base = rng.rand(bs * 2, 30, 40, 3).astype(np.float32)
    images = [
        (cv2.resize(base[i], (640, 480)) * 255).astype(np.uint8)
        for i in range(bs * 2)
    ]
    # degenerate probe: constant image
    images[1] = np.full((480, 640, 3), 127, np.uint8)

    p = DefaultPredictor(cfg)

    t0 = time.perf_counter()
    n = 0
    for idx, out in p.run_batched(((i, im) for i, im in enumerate(images)),
                                  batch_size=bs):
        n += 1
        print(f"img {idx}: {len(out['instances']['scores'])} dets, "
              f"{len(out['segments'])} segments", flush=True)
    dt = time.perf_counter() - t0
    print(f"OK {n} images in {dt:.1f}s (incl compile)", flush=True)


if __name__ == "__main__":
    main()
