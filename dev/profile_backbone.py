"""Locate backbone time: chip peak GEMM/conv, then per-stage ResNet+FPN
timings at the eval bucket shape (4x800x1344)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("device:", jax.devices()[0].device_kind, flush=True)

    reduce = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda acc, x: acc + x.astype(jnp.float32).sum(), o, 0.0))

    def sync(o):
        # reduce on device, fetch one scalar: the tunnel link is slow, so
        # never pull full activations to host inside a timing loop
        return float(reduce(o))

    def timed(name, fn, *a, iters=20, flops=None):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        extra = f"  {flops / dt / 1e12:7.1f} TFLOP/s" if flops else ""
        print(f"{name:34s} {dt * 1e3:8.2f} ms{extra}", flush=True)
        return dt

    # ---- chip peaks ----------------------------------------------------
    k = 4096
    a = jnp.ones((k, k), jnp.bfloat16)
    timed("bf16 4096^3 matmul", jax.jit(lambda a: a @ a), a,
          flops=2 * k ** 3)
    x = jnp.ones((4, 200, 336, 256), jnp.bfloat16)
    w = jnp.ones((3, 3, 256, 256), jnp.bfloat16)
    conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    timed("bf16 3x3x256 conv @200x336", conv, x, w,
          flops=2 * 4 * 200 * 336 * 256 * 256 * 9)

    # ---- model stages --------------------------------------------------
    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.resnet import ResNet
    from u2seg_tpu.models.fpn import FPN
    from u2seg_tpu.models.panoptic_fpn import PanopticFPN

    cfg = Config().model
    b, h, w_ = 4, 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(b, h, w_, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w_]] * b, jnp.int32)

    model = PanopticFPN(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           images[:1], sizes[:1], train=False)

    # preprocess + backbone-only via the model's own modules
    resnet = ResNet(cfg.resnet, dtype=jnp.bfloat16)
    rn_vars = {"params": variables["params"]["backbone"]["bottom_up"],
               "batch_stats": variables.get("batch_stats", {}).get(
                   "backbone", {}).get("bottom_up", {})}
    xin = (images - jnp.array(cfg.pixel_mean)) / jnp.array(cfg.pixel_std)
    xin = jnp.pad(xin, ((0, 0), (0, 0), (0, 0), (0, 0)))

    rn_apply = jax.jit(lambda v, x: resnet.apply(v, x, train=False))
    feats = rn_apply(rn_vars, xin)
    for name, f in feats.items():
        print(f"  {name}: {f.shape} {f.dtype}", flush=True)
    timed("resnet50 (all stages)", rn_apply, rn_vars, xin)

    # per-stage: time prefixes by truncating out_features
    from dataclasses import replace
    for last in ("res2", "res3", "res4", "res5"):
        sub = ResNet(replace(cfg.resnet, out_features=(last,)),
                     dtype=jnp.bfloat16)
        sub_apply = jax.jit(lambda v, x, m=sub: m.apply(v, x, train=False))
        timed(f"resnet prefix ..{last}", sub_apply, rn_vars, xin)

    fpn_vars = {"params": variables["params"]["backbone"]}
    bb = FPN(cfg.fpn, cfg.resnet)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables.get("batch_stats", {}).get(
                   "backbone", {})}
    bb_apply = jax.jit(lambda v, x: bb.apply(v, x, train=False))
    try:
        timed("resnet + FPN", bb_apply, bb_vars, xin)
    except Exception as e:
        print("fpn standalone failed:", type(e).__name__, str(e)[:200])

    # full preprocess-in-model path for comparison
    fwd = jax.jit(lambda v, im, s: model.apply(
        v, im, s, train=False, combine=False).features["p2"])
    try:
        timed("full model backbone path (p2)", fwd, variables, images, sizes)
    except Exception as e:
        print("full path probe failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
