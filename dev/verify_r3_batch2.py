"""Verify driver: raw-u8 device resize + DensePose CSE/confidence heads on
the real TPU.

Covers the public surfaces changed since the last driver run:
- DefaultPredictor.run_batched(device_render=True, device_resize=True)
  on realistic COCO shapes, incl. an image that fits no raw bucket
  (falls back to the host-resize group) and a degenerate constant image;
- device resize parity vs the host f32 path on the same images;
- DensePoseCseHeads + chart UV-confidence losses jitted on the chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform, flush=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    cfg = Config()
    bs = cfg.test.ims_per_batch
    rng = np.random.RandomState(0)
    base = rng.rand(bs * 2, 30, 40, 3).astype(np.float32)
    images = [
        (cv2.resize(base[i], (640, 480), interpolation=cv2.INTER_CUBIC)
         * 255).clip(0, 255).astype(np.uint8)
        for i in range(bs * 2)
    ]
    images[1] = np.full((480, 640, 3), 127, np.uint8)   # degenerate
    images[2] = (rng.rand(700, 900, 3) * 255).astype(np.uint8)  # no raw bucket

    p = DefaultPredictor(cfg)
    t0 = time.perf_counter()
    dev = dict(p.run_batched(enumerate(images), batch_size=bs,
                             device_render=True, device_resize=True))
    print(f"device-resize pass: {len(dev)} imgs in "
          f"{time.perf_counter() - t0:.1f}s (incl compile)", flush=True)
    assert sorted(dev) == list(range(len(images)))
    # oversized image must still produce a full-res result via host resize
    assert dev[2]["sem_seg"].shape == (700, 900)

    t0 = time.perf_counter()
    n = sum(1 for _ in p.run_batched(enumerate(images), batch_size=bs,
                                     device_render=True, device_resize=True))
    print(f"steady-state: {n / (time.perf_counter() - t0):.2f} img/s",
          flush=True)

    for idx in (0, 1):
        host = p(images[idx])
        mism = (host["panoptic"] != dev[idx]["panoptic"]).mean()
        segs = ([s["category_id"] for s in host["segments"]]
                == [s["category_id"] for s in dev[idx]["segments"]])
        print(f"img {idx}: pan mismatch {mism:.5f}, segments match {segs}",
              flush=True)
        # untrained-weight argmax ties flip under TPU f32 rounding (see
        # dev/verify_device_render.py); trained logits collapse this
        assert mism < 0.02 and segs

    # --- DensePose CSE + confidence heads on chip -----------------------
    from u2seg_tpu.projects import densepose_cse as cse
    from u2seg_tpu.projects.densepose import (
        DensePoseConfig, DensePosePoints, DensePoseROIHead,
        densepose_chart_losses,
    )

    ccfg = cse.CSEConfig(embed_size=16,
                         meshes=(cse.MeshSpec("mini", 128),))
    heads = cse.DensePoseCseHeads(ccfg, head_convs=2, head_dim=64,
                                  pooler_resolution=14)
    feats = {f"p{i+2}": jnp.asarray(
        rng.randn(1, 64 // (2 ** i), 64 // (2 ** i), 32), jnp.float32)
        for i in range(4)}
    boxes = jnp.asarray([[[8.0, 8.0, 120.0, 120.0]]], jnp.float32)
    v = heads.init(jax.random.PRNGKey(0), feats, boxes)
    out = jax.jit(lambda v, f, b: heads.apply(v, f, b))(v, feats, boxes)
    emb = np.asarray(out["embedding"])
    assert emb.shape == (1, 1, 56, 56, 16) and np.isfinite(emb).all()
    print("CSE heads inference OK", emb.shape, flush=True)

    dcfg = DensePoseConfig(num_stacked_convs=2, conv_head_dim=32,
                           uv_confidence="indep_aniso")
    mod = DensePoseROIHead(dcfg)
    pooled = jnp.asarray(rng.randn(2, 14, 14, 32), jnp.float32)
    dv = mod.init(jax.random.PRNGKey(1), pooled)
    pts = DensePosePoints(
        coords=jnp.asarray(rng.rand(2, 6, 2), jnp.float32),
        fine_labels=jnp.asarray(rng.randint(1, 25, (2, 6)), jnp.int32),
        u=jnp.asarray(rng.rand(2, 6), jnp.float32),
        v=jnp.asarray(rng.rand(2, 6), jnp.float32),
        valid=jnp.ones((2, 6), bool),
    )
    s = 14 * 2 * dcfg.up_scale

    @jax.jit
    def conf_losses(dv, pooled):
        o = mod.apply(dv, pooled)
        return densepose_chart_losses(
            o, pts, jnp.zeros((2, s, s), jnp.int32),
            jnp.ones((2,), bool), dcfg)

    losses = conf_losses(dv, pooled)
    vals = {k: float(x) for k, x in losses.items()}
    print("confidence losses:", vals, flush=True)
    assert "loss_densepose_UV" in vals
    assert all(np.isfinite(x) for x in vals.values())
    print("OK", flush=True)


if __name__ == "__main__":
    main()
