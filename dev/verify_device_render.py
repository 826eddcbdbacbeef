"""Verify driver: device-render e2e path on the real TPU.

Drives the changed public API (DefaultPredictor.run_batched with
device_render=True — the new metric-of-record pipeline): u8 host prepare ->
batched device forward + on-device full-res render -> RLE fetch -> host
decode. Includes a degenerate probe (constant image -> typically zero
detections) and a cross-check of one image against the host-render path.
Prints per-batch timing so the transfer/computation split is visible.
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
    base = rng.rand(bs * 3, 30, 40, 3).astype(np.float32)
    images = [
        (cv2.resize(base[i], (640, 480), interpolation=cv2.INTER_CUBIC)
         * 255).clip(0, 255).astype(np.uint8)
        for i in range(bs * 3)
    ]
    images[1] = np.full((480, 640, 3), 127, np.uint8)  # degenerate probe

    p = DefaultPredictor(cfg)

    t0 = time.perf_counter()
    results = {}
    n_fallback = 0
    for idx, out in p.run_batched(
        ((i, im) for i, im in enumerate(images)),
        batch_size=bs, device_render=True,
    ):
        results[idx] = out
        if idx % bs == 0:
            print(f"img {idx}: {len(out['instances']['scores'])} dets, "
                  f"{len(out['segments'])} segments, "
                  f"t={time.perf_counter() - t0:.1f}s", flush=True)
    dt_all = time.perf_counter() - t0
    print(f"device-render pass: {len(results)} imgs in {dt_all:.1f}s "
          f"(incl compile)", flush=True)

    # steady-state timing: second pass, no compile
    t0 = time.perf_counter()
    n = sum(1 for _ in p.run_batched(
        ((i, im) for i, im in enumerate(images)),
        batch_size=bs, device_render=True))
    dt = time.perf_counter() - t0
    print(f"steady-state: {n / dt:.2f} img/s", flush=True)

    # parity cross-check vs host render on image 0 and the degenerate probe
    for idx in (0, 1):
        host = p(images[idx])
        dev = results[idx]
        pan_mismatch = (host["panoptic"] != dev["panoptic"]).mean()
        sem_mismatch = (host["sem_seg"] != dev["sem_seg"]).mean()
        same_segs = (
            [s["category_id"] for s in host["segments"]]
            == [s["category_id"] for s in dev["segments"]]
        )
        print(f"img {idx}: pan mismatch {pan_mismatch:.5f}, "
              f"sem mismatch {sem_mismatch:.5f}, segments match {same_segs}",
              flush=True)
        # the device render is bit-exact vs the host oracle on CPU
        # (tests/engine/test_device_render.py); on the TPU the f32 einsum
        # rounds differently, flipping argmax ties — with UNTRAINED weights
        # the 28 sem logits are near-identical everywhere, so ~0.5% of
        # pixels flip. Trained logits separate and the rate collapses.
        assert pan_mismatch < 0.01 and sem_mismatch < 0.01 and same_segs
    print("OK", flush=True)


if __name__ == "__main__":
    main()
