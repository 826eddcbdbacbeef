"""Model analysis: parameter / FLOP counting.

Counterpart of ``detectron2/utils/analysis.py`` (flop_count_operators :55,
parameter_count :103) — implemented via XLA's cost analysis of the compiled
computation, which reflects the actual executed graph.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np


def parameter_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def parameter_count_table(params, max_depth: int = 3) -> str:
    rows = []

    def walk(node, path):
        if isinstance(node, dict) and len(path) < max_depth:
            total = parameter_count(node)
            rows.append(("  " * len(path) + (path[-1] if path else "model"),
                         total))
            for k in sorted(node):
                walk(node[k], path + [k])
        else:
            rows.append(("  " * len(path) + (path[-1] if path else "leaf"),
                         parameter_count(node)))

    walk(dict(params), [])
    width = max(len(r[0]) for r in rows)
    return "\n".join(f"{n:<{width}} | {c / 1e6:8.3f}M" for n, c in rows)


def flop_count(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs / bytes of the compiled fn at the given example args."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }


def find_unused_parameters(grads) -> list:
    """Names of parameters whose gradient is exactly zero (analogue of ref
    analysis.py:158 find_unused_parameters)."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        else:
            if float(np.max(np.abs(np.asarray(node)))) == 0.0:
                out.append("/".join(path))

    walk(dict(grads), [])
    return out
