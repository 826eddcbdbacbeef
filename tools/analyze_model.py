#!/usr/bin/env python
"""Model analysis: parameter counts, FLOPs, per-module breakdown.

Counterpart of ``tools/analyze_model.py`` + ``detectron2/utils/analysis.py``
(FLOPs/activation counting via fvcore) — TPU version uses XLA's own cost
analysis of the compiled forward, which is exact for the executed graph.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def param_count_tree(params, prefix="", depth=2):
    import jax
    import numpy as np

    rows = []

    def walk(node, path):
        if isinstance(node, dict):
            if len(path) == depth:
                n = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(node))
                rows.append(("/".join(path), int(n)))
            else:
                for k, v in sorted(node.items()):
                    walk(v, path + [k])
        else:
            rows.append(("/".join(path), int(np.prod(node.shape))))

    walk(dict(params), [])
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--height", type=int, default=800)
    parser.add_argument("--width", type=int, default=1344)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from u2seg_tpu.config.config import load_config
    from u2seg_tpu.models.build import build_model

    cfg = load_config(args.config_file or None,
                      [o for o in args.opts if "=" in o])
    model = build_model(cfg)
    h, w = args.height, args.width
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    sizes = jnp.array([[h, w]], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, sizes,
                           train=False)

    total = sum(
        int(x.size) for x in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"Total parameters: {total / 1e6:.2f}M")
    for name, n in param_count_tree(variables["params"]):
        print(f"  {name:40s} {n / 1e6:8.2f}M")

    def fwd(variables, images, sizes):
        out = model.apply(variables, images, sizes, train=False, combine=True)
        return out.detections.boxes

    lowered = jax.jit(fwd).lower(variables, images, sizes)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", float("nan"))
        print(f"Forward FLOPs (XLA cost analysis): {flops / 1e9:.2f} GFLOPs")
        print(f"Bytes accessed: {cost.get('bytes accessed', float('nan')) / 1e9:.2f} GB")
    except Exception as e:
        print("cost analysis unavailable:", e)


if __name__ == "__main__":
    main()
