"""Benchmark: COCO-panoptic inference throughput on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.json): the round north-star is >1000 panoptic img/s on a
v5e-8 at PQ parity, i.e. 125 img/s/chip. ``vs_baseline`` = value / 125.

Default mode is the HONEST end-to-end metric (bench_e2e): the full
``DefaultPredictor.run_batched`` eval pipeline for the flagship
PanopticFPN (R50-FPN, cascade heads, 800 cluster classes, 28 stuff
classes) — host resize/pad, batched device forward, logit fetches, exact
full-resolution host render. ``--forward`` keeps the device-only forward
number (the round-2 metric); ``--train`` measures the train step.
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


def _write_artifact(name: str, payload: dict) -> None:
    """Record the measurement (+ git SHA) under artifacts/ — the
    round-over-round evidence trail; stdout stays the driver contract."""
    if not os.path.isdir("artifacts"):
        return
    import subprocess

    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
    except OSError:
        sha = ""
    with open(os.path.join("artifacts", name), "w") as f:
        json.dump(dict(payload, sha=sha), f, indent=1)
        f.write("\n")


def bench_train():
    """Train-step throughput on the local chip (``bench.py --train``).

    Counterpart of the reference's headline number: Mask R-CNN R50-FPN
    62 img/s on 8xV100 (docs/notes/benchmarks.md:10), i.e. 7.75 img/s/GPU.
    Runs the full flagship config (cascade PanopticFPN, 800 classes, SyncBN)
    at the training bucket with the recipe's per-device batch (16/8 = 2).
    """
    _ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.trainer import Batch, create_train_state, make_train_step
    from u2seg_tpu.parallel.mesh import create_mesh, replicated
    from u2seg_tpu.solver import build_optimizer
    from u2seg_tpu.structures.instances import GtInstances

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    b, h, w = 2, 800, 1344
    g, patch = cfg.model.max_gt_instances, 64
    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.array([[h, w]] * b, dtype=jnp.int32)
    n_real = 20  # realistic instance count; the rest padding
    xy = rng.rand(b, g, 2) * np.array([w / 2, h / 2])
    wh = rng.rand(b, g, 2) * 200 + 16
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    valid = np.zeros((b, g), bool)
    valid[:, :n_real] = True
    gt = GtInstances(
        boxes=jnp.array(boxes),
        classes=jnp.array(
            rng.randint(0, cfg.model.roi_heads.num_classes, (b, g)), jnp.int32
        ),
        valid=jnp.array(valid),
        masks=jnp.array((rng.rand(b, g, patch, patch) > 0.4).astype(np.float32)),
    )
    sem = jnp.array(
        rng.randint(0, cfg.model.sem_seg_head.num_classes, (b, h, w)), jnp.int32
    )
    batch = Batch(images=images, image_sizes=sizes, gt=gt, sem_seg=sem)

    mesh = create_mesh(1)
    tx = build_optimizer(cfg.solver)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch, tx)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx, mesh, donate=True)

    def sync(m):
        # the tunnel backend's block_until_ready can return early; a host
        # fetch of a scalar is the only reliable completion barrier
        return float(np.asarray(m["total_loss"]))

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)    # compile
    sync(metrics)
    state, metrics = step(state, batch, key)    # settle
    sync(metrics)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    sync(metrics)
    dt = time.perf_counter() - t0

    imgs_per_s = b * iters / dt
    baseline_per_chip = 62.0 / 8.0
    result = {
        "metric": "coco_panoptic_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / baseline_per_chip, 4),
    }
    _write_artifact("bench_train.json", result)
    print(json.dumps(result))


def synth_scenes(n_images: int, rng, oh: int = 480, ow: int = 640):
    """COCO-val-like synthetic scenes: a smooth low-frequency background
    plus 10-25 solid elliptical objects per image (COCO val2017 averages
    ~11 GT segments/img; real predictions carry dozens into fusion)."""
    import cv2

    out = []
    for _ in range(n_images):
        base = cv2.resize(rng.rand(6, 8, 3).astype(np.float32), (ow, oh),
                          interpolation=cv2.INTER_CUBIC)
        img = base * 80 + 60
        for _ in range(rng.randint(10, 25)):
            color = (rng.rand(3) * 255).tolist()
            axes = (int(rng.randint(18, 90)), int(rng.randint(18, 90)))
            center = (int(rng.randint(0, ow)), int(rng.randint(0, oh)))
            cv2.ellipse(img, center, axes, float(rng.rand() * 180),
                        0, 360, color, -1)
        out.append(img.clip(0, 255).astype(np.uint8))
    return out


# Bench workload calibration. With the stock random init every cascade
# stage's 801-way softmax saturates to a one-hot on a DIFFERENT class, so
# the 3-stage score average is quantized to {1/3, 2/3, 1}: 99.5% of
# detections score exactly 0.3333 and the fused segment count jumps
# 5.8 -> 65 across a 0.01 threshold move — uncalibratable, and the
# production threshold (0.5) paints ~2 segments/img, an unrealistically
# light render/RLE/decode workload. The bench therefore scales the three
# cls_score heads' weights by TAU (equivalent to init std 0.01*TAU —
# a bench-init choice, no product knob changes), which de-saturates the
# softmax into a smooth per-ROI score distribution (q5..q95 = 0.09..0.31
# at TAU=0.12), and sets the fusion threshold in that smooth region so
# segment counts land on a COCO-like 10-30/img dial (measured mean 20.8,
# p50 15, p90 39 on synth_scenes; COCO val2017 averages ~11 GT
# segments/img and real predictions carry dozens into fusion). All padded
# compute shapes (100 dets/img, 800 classes) stay at product defaults.
# Fetch prefix covers the measured run high-water mark (~10.0k runs/img)
# so the common case stays ONE fetch per batch.
BENCH_CLS_WEIGHT_TAU = 0.12
BENCH_FUSION_CONF_THRESH = 0.25
BENCH_FETCH_RUNS_PER_IMAGE = 12288
# fusion budget = the detection cap: at the bench threshold some images'
# eligible-instance count exceeds the product default budget (50), and
# each over-budget image triggers the exact host-render fallback, whose
# per-image sem-logits fetch (~7.5 MB) costs seconds on the dev tunnel.
BENCH_RENDER_K_FUSE = 100


def _spread_cls_scores(variables, tau: float = BENCH_CLS_WEIGHT_TAU):
    """Rescale every ``cls_score`` head's params by ``tau`` (see note above)."""

    def walk(d, path=()):
        return {k: walk(v, path + (k,)) if isinstance(v, dict)
                else (v * tau if path and path[-1] == "cls_score" else v)
                for k, v in d.items()}

    v = dict(variables)
    v["params"] = walk(dict(v["params"]))
    return v


def bench_e2e(n_images: int = 200, detail_path: str | None = None):
    """Honest end-to-end panoptic throughput (``bench.py`` default mode).

    Drives the metric-of-record path — ``DefaultPredictor.run_batched``
    with the production config (device_render + device_resize on): raw
    uint8 batch upload -> on-device test-time resize -> batched jitted
    forward -> exact full-resolution ON-DEVICE render (mask paste +
    semantic upsample + panoptic fusion + RLE pack, engine/device_render.py)
    -> compacted RLE fetch -> threaded host decode to panoptic maps
    (engine/panoptic_render.py holds the host oracle/fallback for the same
    math). This is the same pipeline ``run_panoptic_evaluation`` uses minus
    dataset IO and evaluators (reference counterpart:
    evaluation/evaluator.py:103 inference loop + detector_postprocess/
    sem_seg_postprocess/combine_semantic_and_instance_outputs).

    Images are synthetic COCO-val-like 480x640 RGB (all map to the
    800x1344 bucket, so exactly one compile). Throughput excludes compile
    (one warmup batch) and is reported per chip.
    """
    _ensure_tpu_or_reexec()
    import jax

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    cfg.model.panoptic.instance_conf_thresh = BENCH_FUSION_CONF_THRESH
    cfg.test.fetch_runs_per_image = BENCH_FETCH_RUNS_PER_IMAGE
    cfg.test.render_k_fuse = BENCH_RENDER_K_FUSE
    bs = cfg.test.ims_per_batch
    rng = np.random.RandomState(0)
    images = synth_scenes(n_images, rng)

    predictor = DefaultPredictor(cfg)
    predictor.variables = _spread_cls_scores(predictor.variables)

    def stream(imgs):
        for i, im in enumerate(imgs):
            yield i, im

    # warmup: one full batch through the bucket (compile + settle)
    n_det = 0
    for _, out in predictor.run_batched(stream(images[:bs]), batch_size=bs,
                                        device_render=cfg.test.device_render,
                                        device_resize=cfg.test.device_resize):
        n_det += len(out["instances"]["scores"])

    predictor.fetch_stats = {"fetches": 0, "bytes": 0}
    t0 = time.perf_counter()
    count = 0
    seg_counts = []
    det_counts = []
    for _, out in predictor.run_batched(stream(images), batch_size=bs,
                                        device_render=cfg.test.device_render,
                                        device_resize=cfg.test.device_resize):
        count += 1
        seg_counts.append(len(out["segments"]))
        det_counts.append(len(out["instances"]["scores"]))
    dt = time.perf_counter() - t0
    seg_count = sum(seg_counts)

    imgs_per_s = count / dt
    baseline_per_chip = 1000.0 / 8.0
    result = {
        "metric": "coco_panoptic_e2e_imgs_per_sec_per_chip",
        "value": round(imgs_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / baseline_per_chip, 4),
    }
    if detail_path:
        link = _measure_link()
        fs = predictor.fetch_stats
        n_batches = max(count // bs, 1)
        # steady-state link cost of one image through the pipelined drain:
        # raw-u8 upload + coalesced fetch bytes + the per-batch fetch RTT
        up_mb = images[0].nbytes / 1e6
        down_mb = fs["bytes"] / max(count, 1) / 1e6
        link_s_per_img = (
            up_mb / max(link["h2d_MBps"], 1e-6)
            + down_mb / max(link["d2h_MBps"], 1e-6)
            + link["rtt_ms"] / 1e3 * fs["fetches"] / n_batches / bs
        )
        link_bound = 1.0 / max(link_s_per_img, 1e-9)
        pipeline_rate = None
        try:
            with open("artifacts/bench_pipeline.json") as f:
                pipeline_rate = json.load(f)["value"]
        except (OSError, KeyError, ValueError):
            pass
        bound = (min(pipeline_rate, link_bound)
                 if pipeline_rate else link_bound)
        sc = np.asarray(seg_counts)
        detail = dict(
            result, n_images=count,
            dets_per_img_warmup=n_det / max(bs, 1),
            segments_per_img=round(seg_count / max(count, 1), 2),
            segments_p50=float(np.median(sc)),
            segments_p90=float(np.percentile(sc, 90)),
            dets_per_img=round(float(np.mean(det_counts)), 1),
            fusion_conf_thresh=BENCH_FUSION_CONF_THRESH,
            cls_weight_tau=BENCH_CLS_WEIGHT_TAU,
            workload="synth_scenes 10-25 ellipses/img (COCO-like segment "
                     "counts; see BENCH_CLS_WEIGHT_TAU note in bench.py)",
            device_render=cfg.test.device_render,
            fetches_per_batch=round(fs["fetches"] / n_batches, 2),
            bytes_down_MB_per_img=round(down_mb, 4),
            bytes_up_MB_per_img=round(up_mb, 4),
            runs_max_batch=fs.get("runs_max_batch", 0),
            link=link,
            link_bound_imgs_per_s=round(link_bound, 2),
            pipeline_imgs_per_s=pipeline_rate,
            frac_of_bound=round(imgs_per_s / bound, 4) if bound else None,
        )
        _write_artifact(os.path.basename(detail_path), detail)
    print(json.dumps(result))


def _measure_link() -> dict:
    """Measure the host<->device link AT RUN TIME so the e2e artifact
    self-explains when the dev tunnel sags (round-4 lesson: committed
    link numbers go stale within hours)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1)
    float(np.asarray(tiny(jnp.zeros(()))))
    t0 = time.perf_counter()
    for _ in range(3):
        float(np.asarray(tiny(jnp.zeros(()))))
    rtt = (time.perf_counter() - t0) / 3

    nbytes = 4 * 1024 * 1024
    # a jax.Array caches its host copy after the first np.asarray, so the
    # timed fetch must use a FRESH device array each round (a cached
    # re-fetch measures ~0 s and reports petabytes/s)
    mk = jax.jit(lambda x: x + 1)
    dev = mk(jnp.zeros((nbytes,), jnp.uint8))
    np.asarray(dev)  # settle the transfer path
    rounds = []
    for _ in range(2):
        dev = mk(dev)
        dev.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(dev)
        rounds.append(time.perf_counter() - t0)
    d2h = nbytes / 1e6 / max(min(rounds) - rtt, 1e-9)

    host = np.zeros((nbytes,), np.uint8)
    jax.device_put(host).block_until_ready()
    t0 = time.perf_counter()
    jax.device_put(host).block_until_ready()
    h2d = nbytes / 1e6 / max(time.perf_counter() - t0 - rtt, 1e-9)
    return {"rtt_ms": round(rtt * 1e3, 2), "d2h_MBps": round(d2h, 1),
            "h2d_MBps": round(h2d, 1)}


def bench_pipeline():
    """On-device full eval pipeline throughput (``bench.py --pipeline``):
    device resize + forward + exact full-res render, inputs pre-staged on
    device, executions queued back-to-back. This is the chip-side ceiling
    of the e2e metric — what the honest pipeline delivers once the
    host<->device link is PCIe-class instead of the dev tunnel (see
    artifacts/e2e_trace.json for the link decomposition)."""
    _ensure_tpu_or_reexec()
    import time as _time

    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # identical compiled program to bench_e2e (fusion thresh and fetch
    # prefix are compile-time constants) and the same COCO-like workload
    cfg = Config()
    cfg.model.panoptic.instance_conf_thresh = BENCH_FUSION_CONF_THRESH
    cfg.test.fetch_runs_per_image = BENCH_FETCH_RUNS_PER_IMAGE
    cfg.test.render_k_fuse = BENCH_RENDER_K_FUSE
    bs = cfg.test.ims_per_batch
    rng = np.random.RandomState(0)
    p = DefaultPredictor(cfg)
    p.variables = _spread_cls_scores(p.variables)
    raw = jnp.asarray(np.stack(synth_scenes(bs, rng)))
    osizes = jnp.asarray(np.array([[480, 640]] * bs, np.int32))
    sizes = jnp.asarray(np.array([[800, 1067]] * bs, np.int32))
    bucket = (800, 1344)

    def sync(out):
        # out = (packed fetch buffer, rendered struct, mask/sem logits)
        return float(np.asarray(out[1].offs).reshape(-1)[-1])

    out = p._fwd_render_raw(p.variables, raw, osizes, sizes, bucket=bucket)
    sync(out)

    tiny = jax.jit(lambda x: x + 1)
    float(np.asarray(tiny(jnp.zeros(()))))
    t0 = _time.perf_counter()
    float(np.asarray(tiny(jnp.zeros(()))))
    rtt = _time.perf_counter() - t0

    iters = 10
    t0 = _time.perf_counter()
    for _ in range(iters):
        out = p._fwd_render_raw(
            p.variables, raw, osizes, sizes, bucket=bucket)
    sync(out)
    dt = max(_time.perf_counter() - t0 - rtt, 1e-9)

    imgs_per_s = bs * iters / dt
    baseline_per_chip = 1000.0 / 8.0
    result = {
        "metric": "coco_panoptic_device_pipeline_imgs_per_sec_per_chip",
        "value": round(imgs_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / baseline_per_chip, 4),
    }
    _write_artifact("bench_pipeline.json", result)
    print(json.dumps(result))


def bench_forward():
    _ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.build import build_model

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    model = build_model(cfg)

    b, h, w = 8, 800, 1344   # throughput-optimal batch on v5e
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
    result = {
        "metric": "coco_panoptic_inference_imgs_per_sec_per_chip",
        "value": round(imgs_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / baseline_per_chip, 4),
    }
    _write_artifact("bench_forward.json", result)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--train" in sys.argv:
        bench_train()
    elif "--forward" in sys.argv:
        bench_forward()   # device-only forward (the round-2 metric)
    elif "--pipeline" in sys.argv:
        bench_pipeline()  # on-device resize+forward+render, no link
    else:
        bench_e2e(detail_path="artifacts/bench_e2e.json"
                  if os.path.isdir("artifacts") else None)
