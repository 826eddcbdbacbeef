"""Itemized chip-side ceiling trace -> artifacts/pipeline_ceiling.json.

The round north-star is 125 img/s/chip (= 1000 img/s on a v5e-8) for the
full device pipeline (resize + forward + full-res render + RLE pack).
This script decomposes the measured pipeline rate into per-stage ms/img
(cumulative-prefix timing, same method as dev/profile_stages.py) and sets
each stage against the hardware floor implied by dev/profile_mxu.py's
measured practical peaks, so the remaining gap to the north-star is
itemized rather than asserted.

Floors are computed from measured sustained rates on THIS chip (matmul
~160 TFLOP/s bf16, big convs 110-150, HBM ~819 GB/s nominal), not
datasheet numbers.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_stages import _ensure_tpu_or_reexec  # noqa: E402


def main():
    _ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp

    import bench
    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    cfg = Config()
    cfg.model.panoptic.instance_conf_thresh = bench.BENCH_FUSION_CONF_THRESH
    cfg.test.fetch_runs_per_image = bench.BENCH_FETCH_RUNS_PER_IMAGE
    cfg.test.render_k_fuse = bench.BENCH_RENDER_K_FUSE
    bs = cfg.test.ims_per_batch
    rng = np.random.RandomState(0)
    imgs = bench.synth_scenes(bs, rng)
    raw = jnp.asarray(np.stack(imgs))
    osizes = jnp.asarray(np.array([[480, 640]] * bs, np.int32))
    sizes = jnp.asarray(np.array([[800, 1067]] * bs, np.int32))
    bucket = (800, 1344)

    p = DefaultPredictor(cfg)
    p.variables = bench._spread_cls_scores(p.variables)

    def timeit(fn, sync, iters=10):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters

    # forward only (detections + logits, no render; raw-u8 input — the
    # same program shape the batched predictor compiles)
    padded, hw, ohow, _ = p._prepare_raw(imgs[0])
    stack = jnp.asarray(np.stack([padded] * bs))
    szs = jnp.asarray(np.array([hw] * bs, np.int32))
    t_fwd = timeit(
        lambda: p._fwd(p.variables, stack, szs),
        lambda o: float(np.asarray(o.detections.scores[0, 0])))
    # full device pipeline (resize + forward + render + pack)
    t_full = timeit(
        lambda: p._fwd_render_raw(p.variables, raw, osizes, sizes,
                                  bucket=bucket),
        lambda o: float(np.asarray(o[1].offs).reshape(-1)[-1]))

    ms_img = lambda t: t / bs * 1e3  # noqa: E731

    # stage items from the HLO trace at this HEAD (dev/trace_* rankers):
    # pooler kernels, RLE sorts, per-image render loop, paint scan. These
    # are re-derived here from a fresh profiler trace so the artifact is
    # self-contained.
    import collections
    import glob
    import gzip

    trace_dir = "/tmp/jtrace_ceiling"
    out = p._fwd_render_raw(p.variables, raw, osizes, sizes, bucket=bucket)
    float(np.asarray(out[1].offs).reshape(-1)[-1])
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = p._fwd_render_raw(p.variables, raw, osizes, sizes,
                                    bucket=bucket)
        float(np.asarray(out[1].offs).reshape(-1)[-1])
    d = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(d) as fh:
        tr = json.load(fh)
    fam = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        n = e.get("name", "?")
        if n.startswith("$") or "trace" in n or n.startswith("jit_") or \
                n.startswith("Pjit") or n.startswith("np."):
            continue
        fam[n.split(".")[0]] += e.get("dur", 0)
    per_batch = {k: v / 3e3 for k, v in fam.items()}
    pool_ms = per_batch.get("_ml_pallas_ext", 0.0)
    sort_ms = per_batch.get("sort", 0.0)
    render_loop_ms = per_batch.get("while", 0.0)

    # measured practical ceilings (dev/profile_mxu.py, this chip):
    # bf16 matmul 160-172 TFLOP/s; 3x3 convs at production shapes
    # 111-150 TFLOP/s; early high-res low-channel convs 15-40 (HBM-bound).
    # R50-FPN forward @800x1344 ~ 88 GFLOP/img (x2 MACs) -> floor at
    # 140 TFLOP/s ~ 1.3 ms/img; measured backbone ~3.9 ms/img is
    # HBM-bound on early layers (res2 stack streams ~1 GB/img at bf16).
    flops_img_fwd = 88e9 * 2
    mxu_floor_ms = flops_img_fwd / 140e12 * 1e3
    # pooler floor: 3 cascade pools x 1000 ROIs/img, window stream
    # ~0.65 MB/ROI bf16 -> ~2 GB/img / 819 GB/s
    pool_floor_ms = 3 * 1000 * 0.655e6 / 819e9 * 1e3

    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True).stdout.strip()
    report = {
        "sha": sha,
        "batch": bs,
        "workload": "bench synth_scenes, k_fuse=100, thresh=0.25",
        "measured": {
            "forward_ms_per_img": round(ms_img(t_fwd), 2),
            "full_pipeline_ms_per_img": round(ms_img(t_full), 2),
            "pipeline_imgs_per_s": round(1e3 / ms_img(t_full), 2),
            "render_tail_ms_per_img": round(
                ms_img(t_full) - ms_img(t_fwd), 2),
        },
        "device_items_ms_per_batch8": {
            "pooler_kernels(3 cascade + mask)": round(pool_ms, 1),
            "rle_sorts(pan+sem)": round(sort_ms, 1),
            "per_image_render_loop": round(render_loop_ms, 1),
            "conv_and_misc_fusions": round(
                sum(per_batch.values())
                - pool_ms - sort_ms - render_loop_ms, 1),
        },
        "floors_ms_per_img": {
            "mxu_forward_floor(140 TFLOP/s measured on big convs)": round(
                mxu_floor_ms, 2),
            "pooler_hbm_floor(3x1000 ROI windows @819 GB/s)": round(
                pool_floor_ms, 2),
        },
        "north_star_gap": {
            "target_ms_per_img": 8.0,
            "now_ms_per_img": round(ms_img(t_full), 2),
            "itemized_remaining": [
                "backbone/heads convs are HBM-bound on early high-res "
                "low-channel layers (res2 1x1 pairs run at 15 TFLOP/s vs "
                "150 for late 3x3s; s2d stem rewrite measured 2.6x "
                "slower, reverted)",
                "pooler is within ~35% of its window-stream HBM floor "
                "(adaptive per-axis tiers + streamed weights already "
                "applied; flat vs extents in ablation)",
                "render tail: RLE sorts + per-image map loop remain after "
                "the serial-gather kill; both scale with canvas area",
            ],
        },
    }
    print(json.dumps(report, indent=1), flush=True)
    if os.path.isdir("artifacts"):
        with open("artifacts/pipeline_ceiling.json", "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
