"""Device-trace the full PanopticFPN inference and rank HLO ops by time.

Usage: python dev/trace_model.py [--train]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("device:", jax.devices()[0].device_kind, flush=True)

    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.build import build_model

    cfg = Config()
    model = build_model(cfg)
    b, h, w = 8, 800, 1344
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

    out = forward(variables, images, sizes)
    jax.block_until_ready(out)

    trace_dir = "/tmp/jtrace_model"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = forward(variables, images, sizes)
        jax.block_until_ready(out)

    d = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(d) as fh:
        tr = json.load(fh)
    ev = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
    by = collections.Counter()
    total = 0
    for e in ev:
        n = e.get("name", "?")
        if n.startswith("$") or "trace" in n or n.startswith("jit_") or \
                n.startswith("Pjit"):
            continue
        by[n[:60]] += e.get("dur", 0)
        total += e.get("dur", 0)
    print(f"total device op time: {total / 3e3:.2f} ms/call")
    for name, dur in by.most_common(40):
        print(f"{dur / 3e3:8.3f} ms/call  {name}")


if __name__ == "__main__":
    main()
