"""Benchmark: COCO-panoptic inference throughput on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.json): the round north-star is >1000 panoptic img/s on a
v5e-8 at PQ parity, i.e. 125 img/s/chip. ``vs_baseline`` = value / 125.

The benchmark runs the flagship PanopticFPN (R50-FPN, cascade heads,
800 cluster classes, 28 stuff classes) end-to-end — backbone, RPN+NMS,
3-stage cascade, mask head, semantic head, on-device panoptic fusion — on
the COCO eval input bucket (800x1344), steady-state, excluding compile.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _ensure_tpu_or_reexec(max_tries: int = 5, wait_s: int = 90) -> None:
    """The axon TPU tunnel admits one client; if another process held the
    claim when this interpreter started, the backend silently failed to
    register and can only be retried in a FRESH process. Re-exec with a
    retry counter in the environment."""
    import jax

    try:
        jax.devices()
        return
    except RuntimeError as e:
        tries = int(os.environ.get("U2SEG_BENCH_TRIES", "0"))
        if tries >= max_tries or "axon" not in str(e):
            raise
        sys.stderr.write(
            f"TPU backend unavailable ({e}); retry {tries + 1}/{max_tries} "
            f"in {wait_s}s\n"
        )
        time.sleep(wait_s)
        os.environ["U2SEG_BENCH_TRIES"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    _ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.build import build_model

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    model = build_model(cfg)

    b, h, w = 4, 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w]] * b, dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1], train=False
    )

    @jax.jit
    def forward(variables, images, sizes):
        out = model.apply(variables, images, sizes, train=False, combine=True)
        return out.detections.boxes, out.detections.scores, out.panoptic

    def sync(o):
        # force real completion: the experimental tunnel backend's
        # block_until_ready can return early, so fetch a leaf to host
        return np.asarray(jax.tree_util.tree_leaves(o)[0]).sum()

    # warmup / compile
    out = forward(variables, images, sizes)
    sync(out)

    # measure the host<->device round-trip overhead of one sync
    tiny = jax.jit(lambda x: x + 1)
    sync(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    sync(tiny(jnp.zeros(())))
    rtt = time.perf_counter() - t0

    # dispatch all iterations, sync once: executions queue back-to-back on
    # the device, so (total - rtt) / iters is the true per-batch time
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, images, sizes)
    sync(out)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)

    imgs_per_s = b * iters / dt
    baseline_per_chip = 1000.0 / 8.0
    print(json.dumps({
        "metric": "coco_panoptic_inference_imgs_per_sec_per_chip",
        "value": round(imgs_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / baseline_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
