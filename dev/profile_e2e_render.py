"""Trace decomposition of the device-render e2e pipeline (bench.py default
mode) + tunnel microbenchmarks. Writes artifacts/e2e_trace.json.

Answers, with numbers: where does each millisecond of the honest
end-to-end metric go, how much of it is the development tunnel's
host<->device link (~tens of MB/s, single TCP stream, ~30 ms RTT), and
what the same pipeline costs on a production host (PCIe-class link).

Uses the SAME workload and compiled program as bench.py (synth_scenes,
cls-weight tau spread, bench fusion threshold / k_fuse / fetch prefix) so
every number here is directly comparable to bench_e2e.json and
bench_pipeline.json.

Two device rates are reported, and they differ by design:
- serial "device" = one dispatch, then a completion barrier. On the
  tunnel every dispatch pays upload (h2d bytes) + per-hop RTTs + result
  readiness polling INSIDE the barrier, so this number is link-dominated.
- queued = bench_pipeline's method: inputs pre-staged on device, N
  executions dispatched back-to-back, one barrier at the end. Dispatch
  overhead overlaps execution; this is the chip-side rate.
The gap between them is the per-dispatch link tax, not device time (the
round-4 trace left this unexplained; it is structural to a ~30 ms-RTT
remote backend, not a property of the pipeline).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _sync_scalar(x):
    return float(np.asarray(x).reshape(-1)[0])


def tunnel_microbench(jnp, jax):
    """RTT + h2d/d2h bandwidth of the host<->device link."""
    tiny = jax.jit(lambda x: x + 1)
    _sync_scalar(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        _sync_scalar(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5

    nbytes = 16 * 2 ** 20
    host = np.zeros(nbytes, np.uint8)
    dev = jnp.asarray(host)
    _sync_scalar(dev[:1])
    t0 = time.perf_counter()
    dev = jnp.asarray(host)          # h2d
    _sync_scalar(dev[-1:])
    h2d = nbytes / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    _ = np.asarray(dev)              # d2h (first host fetch — uncached)
    d2h = nbytes / (time.perf_counter() - t0)
    return {"rtt_ms": rtt * 1e3, "h2d_MBps": h2d / 1e6,
            "d2h_MBps": d2h / 1e6}


def main(n_images=48):
    import jax
    import jax.numpy as jnp

    import bench
    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    cfg.model.panoptic.instance_conf_thresh = bench.BENCH_FUSION_CONF_THRESH
    cfg.test.fetch_runs_per_image = bench.BENCH_FETCH_RUNS_PER_IMAGE
    cfg.test.render_k_fuse = bench.BENCH_RENDER_K_FUSE
    bs = cfg.test.ims_per_batch
    rng = np.random.RandomState(0)
    images = bench.synth_scenes(n_images, rng)

    p = DefaultPredictor(cfg)
    p.variables = bench._spread_cls_scores(p.variables)
    link = tunnel_microbench(jnp, jax)
    print("link:", link, flush=True)

    # warmup/compile via the public path
    list(p.run_batched(
        ((i, im) for i, im in enumerate(images[:bs])), batch_size=bs,
        device_render=True, device_resize=True))
    print("compiled", flush=True)

    # serial stage timing (one batch at a time, no pipelining)
    t = {"prepare": 0.0, "upload_dispatch": 0.0, "device": 0.0,
         "decode": 0.0}
    bytes_up = 0
    bytes_down = 0
    p.fetch_stats = {"fetches": 0, "bytes": 0}
    nb = n_images // bs
    for b in range(nb):
        t0 = time.perf_counter()
        prepped = [p._prepare_raw(images[b * bs + i]) for i in range(bs)]
        raw = np.stack([q[0] for q in prepped])
        sizes = np.array([q[1] for q in prepped], np.int32)
        osizes = np.array([q[2] for q in prepped], np.int32)
        bucket = prepped[0][3]
        t1 = time.perf_counter()
        out = p._fwd_render_raw(
            p.variables, jnp.asarray(raw), jnp.asarray(osizes),
            jnp.asarray(sizes), bucket=bucket)
        bytes_up += raw.nbytes
        t2 = time.perf_counter()
        _sync_scalar(out[1].offs[-1])    # completion barrier
        t3 = time.perf_counter()
        group = [(i, None, tuple(sizes[i]), tuple(osizes[i]))
                 for i in range(bs)]
        results = list(p._drain_rendered(group, bs, out))
        t4 = time.perf_counter()
        t["prepare"] += t1 - t0
        t["upload_dispatch"] += t2 - t1
        t["device"] += t3 - t2
        t["decode"] += t4 - t3
    seg_counts = [len(r[1]["segments"]) for r in results]
    bytes_down = p.fetch_stats["bytes"]
    fetches_per_batch = p.fetch_stats["fetches"] / nb

    # queued chip-side rate (bench_pipeline's method): inputs pre-staged,
    # executions back-to-back, one barrier
    raw_d = jnp.asarray(raw)
    osz_d = jnp.asarray(osizes)
    sz_d = jnp.asarray(sizes)
    iters = 10
    out = p._fwd_render_raw(p.variables, raw_d, osz_d, sz_d, bucket=bucket)
    _sync_scalar(out[1].offs[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = p._fwd_render_raw(p.variables, raw_d, osz_d, sz_d,
                                bucket=bucket)
    _sync_scalar(out[1].offs[-1])
    queued_ms_per_img = (time.perf_counter() - t0 - link["rtt_ms"] / 1e3) \
        / (iters * bs) * 1e3

    n = nb * bs
    total = sum(t.values())
    stages_ms = {k: v / n * 1e3 for k, v in t.items()}
    up_mb = bytes_up / n / 1e6
    down_mb = bytes_down / n / 1e6
    # projection: same pipeline on a local host (PCIe gen3 x16 ~ 10 GB/s)
    link_ms_here = (up_mb / link["h2d_MBps"]
                    + down_mb / link["d2h_MBps"]) * 1e3 \
        + link["rtt_ms"] * fetches_per_batch / bs
    link_ms_pcie = (up_mb + down_mb) / 10_000 * 1e3

    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True).stdout.strip()
    report = {
        "sha": sha,
        "batch": bs,
        "n_images": n,
        "workload": {
            "segments_per_img_last_batch": float(np.mean(seg_counts)),
            "fusion_conf_thresh": bench.BENCH_FUSION_CONF_THRESH,
            "cls_weight_tau": bench.BENCH_CLS_WEIGHT_TAU,
            "render_k_fuse": bench.BENCH_RENDER_K_FUSE,
        },
        # serial barrier = upload + per-hop RTTs + compute + readiness
        # polling (link-dominated on the tunnel); queued = chip-side rate
        "stages_ms_per_img_serial": {k: round(v, 2)
                                     for k, v in stages_ms.items()},
        "total_ms_per_img_serial": round(total / n * 1e3, 2),
        "serial_imgs_per_s": round(n / total, 2),
        "queued_device_ms_per_img": round(queued_ms_per_img, 2),
        "queued_device_imgs_per_s": round(1e3 / queued_ms_per_img, 2),
        "serial_minus_queued_ms_per_img_is_link_tax": round(
            stages_ms["device"] - queued_ms_per_img, 2),
        "fetches_per_batch": round(fetches_per_batch, 2),
        "bytes_up_MB_per_img": round(up_mb, 3),
        "bytes_down_MB_per_img": round(down_mb, 3),
        "link": {k: round(v, 2) for k, v in link.items()},
        "link_ms_per_img_at_measured_bw": round(link_ms_here, 2),
        "link_ms_per_img_at_pcie_10GBps": round(link_ms_pcie, 3),
        "note": (
            "serial 'device' includes the per-dispatch link tax (h2d "
            "upload + ~rtt_ms round trips + result-readiness polling "
            "inside the completion barrier), which is why it exceeds the "
            "queued chip-side rate by serial_minus_queued_ms_per_img — "
            "that gap is the tunnel, not device time. On a production "
            "host (PCIe) the same bytes cost "
            "link_ms_per_img_at_pcie_10GBps and the pipeline is "
            "compute-bound at ~queued_device_imgs_per_s (see "
            "artifacts/bench_pipeline.json)."
        ),
    }
    for k, v in report.items():
        print(k, v, flush=True)
    if os.path.isdir("artifacts"):
        with open("artifacts/e2e_trace.json", "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
