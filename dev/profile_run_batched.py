"""Timeline of DefaultPredictor.run_batched steady state on the real TPU.

Records wall-clock spans for every main-thread phase (prepare, jit call)
and every worker span (drain = sync + fetch + decode), then prints a
Gantt-style summary and the achieved e2e rate next to the
contemporaneous link bandwidth — the dev tunnel's bandwidth varies by
>5x over tens of minutes, so any e2e number is only interpretable
against a link probe taken in the same minute.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

EVENTS = []
EV_LOCK = threading.Lock()


def ev(name, t0, t1):
    with EV_LOCK:
        EVENTS.append((name, t0, t1))


def link_probe(jax, jnp):
    host = np.zeros(4 * 2 ** 20, np.uint8)
    x = jax.device_put(host)
    x.block_until_ready()
    float(jnp.asarray(x[0], jnp.float32))
    t0 = time.perf_counter()
    x = jax.device_put(host)
    float(jnp.asarray(x[0], jnp.float32))
    up = host.nbytes / (time.perf_counter() - t0) / 1e6
    y = x + np.uint8(1)
    y.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(y)
    down = host.nbytes / (time.perf_counter() - t0) / 1e6
    return round(up, 1), round(down, 1)


def stream_n(imgs):
    for i, im in enumerate(imgs):
        yield i, im


def main():
    import bench
    bench._ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.engine.predictor import DefaultPredictor

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = Config()
    bs = cfg.test.ims_per_batch
    n_images = int(os.environ.get("PROF_N", "64"))
    rng = np.random.RandomState(0)
    base = rng.rand(n_images, 30, 40, 3).astype(np.float32)
    import cv2
    images = [
        (cv2.resize(base[i], (640, 480), interpolation=cv2.INTER_CUBIC)
         * 255).clip(0, 255).astype(np.uint8)
        for i in range(n_images)
    ]

    pred = DefaultPredictor(cfg)
    link0 = link_probe(jax, jnp)
    print("link before:", link0, "MB/s", flush=True)

    orig_prepare = pred._prepare_raw
    orig_fwd = pred._fwd_render_raw
    orig_drain = pred._drain_rendered

    def prepare(img):
        t0 = time.perf_counter()
        out = orig_prepare(img)
        ev("prepare", t0, time.perf_counter())
        return out

    def fwd(*a, **k):
        t0 = time.perf_counter()
        out = orig_fwd(*a, **k)
        ev("jit_call", t0, time.perf_counter())
        return out

    def drain(group, n_real, out):
        t0 = time.perf_counter()
        res = list(orig_drain(group, n_real, out))
        ev("drain", t0, time.perf_counter())
        return iter(res)

    pred._prepare_raw = prepare
    pred._fwd_render_raw = fwd
    pred._drain_rendered = drain

    for _ in pred.run_batched(stream_n(images[:bs]), batch_size=bs,
                              device_render=True, device_resize=True):
        pass
    EVENTS.clear()

    t0 = time.perf_counter()
    count = 0
    for _ in pred.run_batched(stream_n(images), batch_size=bs,
                              device_render=True, device_resize=True):
        count += 1
    dt = time.perf_counter() - t0
    link1 = link_probe(jax, jnp)
    print("link after:", link1, "MB/s", flush=True)
    print(f"e2e: {count / dt:.2f} img/s ({dt / count * 1e3:.1f} ms/img)",
          flush=True)

    with EV_LOCK:
        events = sorted(EVENTS, key=lambda e: e[1])
    t_base = events[0][1]
    by = {}
    for name, a, b in events:
        by.setdefault(name, []).append((a - t_base, b - t_base))
    for name, spans in by.items():
        tot = sum(b - a for a, b in spans)
        print(f"{name}: n={len(spans)} total={tot * 1e3:.0f} ms "
              f"({tot / count * 1e3:.1f} ms/img)", flush=True)
    print("--- timeline (ms since start) ---", flush=True)
    for name, a, b in [(n, a - t_base, b - t_base) for n, a, b in events][:60]:
        print(f"{a * 1e3:8.1f} -> {b * 1e3:8.1f}  ({(b - a) * 1e3:7.1f})  "
              f"{name}", flush=True)
    out = {
        "e2e_img_per_s": round(count / dt, 2),
        "ms_per_img": round(dt / count * 1e3, 2),
        "link_before_MBps": link0,
        "link_after_MBps": link1,
        "per_phase_ms_per_img": {
            name: round(sum(b - a for a, b in spans) / count * 1e3, 2)
            for name, spans in by.items()},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
