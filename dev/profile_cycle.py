"""Isolate run_batched's steady-state cycle cost on the real TPU.

bench_pipeline (same input re-executed) says exec = ~122 ms/batch; the
run_batched timeline says cycle = ~270-300 ms/batch ≈ upload + exec,
even though overlap probes show transfers overlap compute. Hypotheses:

  H1 exec on FRESH device inputs costs more than exec on the same input
     (per-arg registration / layout copy in the tunnel runtime)
  H2 the upload's completion gates the NEXT exec (FIFO per-stream), so
     upload and exec serialize whenever the upload is an exec argument
  H3 something host-side (GIL / client lock) delays the dispatch

Experiments (all sync once at the end, rtt-corrected):
  E1 exec xN, same pre-staged input                       -> exec_same
  E2 exec xN, cycling K distinct pre-staged inputs        -> exec_fresh
  E3 upload xN fresh batches, no exec                     -> upload_only
  E4 loop { upload fresh; exec it } xN (run_batched shape) -> cycle
If E2 == E1 and E4 ≈ max(E1, E3): overlap works, run_batched's gap is
host-side. If E4 ≈ E1 + E3: transfers-as-args serialize with exec.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


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
    rng = np.random.RandomState(0)
    p = DefaultPredictor(cfg)
    print("predictor ready", flush=True)

    hosts = [(rng.rand(bs, 480, 640, 3) * 255).astype(np.uint8)
             for _ in range(4)]
    osizes = jnp.asarray(np.array([[480, 640]] * bs, np.int32))
    sizes = jnp.asarray(np.array([[800, 1067]] * bs, np.int32))
    bucket = (800, 1344)

    def sync(out):
        return float(np.asarray(out[0].offs).reshape(-1)[-1])

    staged = [jnp.asarray(h) for h in hosts]
    for s in staged:
        s.block_until_ready()
    out = p._fwd_render_raw(p.variables, staged[0], osizes, sizes,
                            bucket=bucket)
    sync(out)
    print("compiled", flush=True)

    tiny = jax.jit(lambda x: x + 1)
    float(np.asarray(tiny(jnp.zeros(()))))
    t0 = time.perf_counter()
    float(np.asarray(tiny(jnp.zeros(()))))
    rtt = time.perf_counter() - t0
    print(f"rtt: {rtt * 1e3:.0f} ms", flush=True)

    N = 8
    # E1: same input
    t0 = time.perf_counter()
    for _ in range(N):
        out = p._fwd_render_raw(p.variables, staged[0], osizes, sizes,
                                bucket=bucket)
    sync(out)
    e1 = (time.perf_counter() - t0 - rtt) / N
    print(f"E1 exec_same: {e1 * 1e3:.0f} ms/batch", flush=True)

    # E2: distinct pre-staged inputs
    t0 = time.perf_counter()
    for i in range(N):
        out = p._fwd_render_raw(p.variables, staged[i % 4], osizes, sizes,
                                bucket=bucket)
    sync(out)
    e2 = (time.perf_counter() - t0 - rtt) / N
    print(f"E2 exec_fresh: {e2 * 1e3:.0f} ms/batch", flush=True)

    # E3: upload only (block each to measure true link, then total async)
    t0 = time.perf_counter()
    devs = [jnp.asarray(hosts[i % 4] + np.uint8(i)) for i in range(N)]
    for d in devs:
        d.block_until_ready()
    e3 = (time.perf_counter() - t0) / N
    mbps = hosts[0].nbytes / e3 / 1e6
    print(f"E3 upload_only: {e3 * 1e3:.0f} ms/batch ({mbps:.1f} MB/s)",
          flush=True)

    # E4: upload + exec interleaved (run_batched steady state)
    t0 = time.perf_counter()
    for i in range(N):
        x = jnp.asarray(hosts[i % 4] + np.uint8(100 + i))
        out = p._fwd_render_raw(p.variables, x, osizes, sizes,
                                bucket=bucket)
    sync(out)
    e4 = (time.perf_counter() - t0 - rtt) / N
    print(f"E4 cycle: {e4 * 1e3:.0f} ms/batch "
          f"(serial={e2 * 1e3 + e3 * 1e3:.0f}, "
          f"overlap={max(e2, e3) * 1e3:.0f})", flush=True)

    print(json.dumps({
        "rtt_ms": round(rtt * 1e3, 1),
        "exec_same_ms": round(e1 * 1e3, 1),
        "exec_fresh_ms": round(e2 * 1e3, 1),
        "upload_only_ms": round(e3 * 1e3, 1),
        "upload_MBps": round(mbps, 1),
        "cycle_ms": round(e4 * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
