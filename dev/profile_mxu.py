"""Practical MXU ceilings on the attached chip for the model's hot shapes.

The tunnel backend costs ~0.8 ms per program dispatch, so timing one op
per call measures the dispatch rate, not the op (a first revision of
this script "measured" 285 TFLOP/s f32). Every op here is therefore
CHAINED ~32x inside a single jit program with a data dependency between
iterations (no CSE, no dispatch overhead), and completion is a scalar
host fetch — block_until_ready returns early on this backend.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CHAIN = 256


def main():
    import bench
    bench._ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("devices:", jax.devices(), flush=True)

    key = jax.random.PRNGKey(0)

    def mk(shape, dtype=jnp.bfloat16):
        nonlocal key
        key, k = jax.random.split(key)
        x = jax.jit(lambda kk: jax.random.uniform(kk, shape, dtype))(k)
        x.block_until_ready()
        return x

    tiny = jax.jit(lambda x: x + 1)
    float(np.asarray(tiny(jnp.zeros(()))))
    t0 = time.perf_counter()
    float(np.asarray(tiny(jnp.zeros(()))))
    rtt = time.perf_counter() - t0
    print(f"rtt {rtt * 1e3:.0f} ms", flush=True)

    def timeit(name, prog, flops_per_op, *args, reps=3):
        """prog: jitted fn running CHAIN dependent copies of the op."""
        out = prog(*args)
        float(np.asarray(jnp.asarray(out).reshape(-1)[0]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = prog(*args)
            float(np.asarray(jnp.asarray(out).reshape(-1)[0]))
            best = min(best, time.perf_counter() - t0)
        per_op = best / CHAIN
        print(f"{name:44s} {per_op * 1e3:8.3f} ms  "
              f"{flops_per_op / per_op / 1e12:6.1f} TFLOP/s", flush=True)
        return per_op

    # --- matmul pairs: x(m,k) @ b1(k,n) -> (m,n) @ b2(n,k) -> (m,k) -----
    def matmul_pair(m, k_, n, label):
        x, b1, b2 = mk((m, k_)), mk((k_, n)), mk((n, k_))

        @jax.jit
        def prog(x, b1, b2):
            def body(_, x):
                y = x @ b1
                return (y @ b2) * jnp.bfloat16(1e-3)
            return jax.lax.fori_loop(0, CHAIN // 2, body, x)[0, 0]

        flops = (2 * m * k_ * n + 2 * m * n * k_) / 2  # per single matmul
        timeit(f"matmul {m}x{k_}x{n} [{label}]", prog, flops, x, b1, b2)

    matmul_pair(8000, 12544, 1024, "boxhead fc1")
    matmul_pair(8000, 1024, 805, "fc2/predictor-ish")
    matmul_pair(4096, 4096, 4096, "square 4k")

    # --- same-channel convs chained: x = conv(x, w) * eps + x -----------
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_chain(bsz, h, w, c, kk, label, cmid=None):
        cmid = cmid or c
        x = mk((bsz, h, w, c))
        w1 = mk((kk, kk, c, cmid))
        w2 = mk((1, 1, cmid, c)) if cmid != c else None
        pad = kk // 2

        @jax.jit
        def prog(x, w1, w2):
            def body(_, x):
                y = jax.lax.conv_general_dilated(
                    x, w1, (1, 1), [(pad, pad), (pad, pad)],
                    dimension_numbers=dn)
                if w2 is not None:
                    y = jax.lax.conv_general_dilated(
                        y, w2, (1, 1), [(0, 0), (0, 0)],
                        dimension_numbers=dn)
                return y * jnp.bfloat16(1e-2) + x
            n_ops = CHAIN // (2 if w2 is not None else 1)
            return jax.lax.fori_loop(0, n_ops, body, x)[0, 0, 0, 0]

        f1 = 2 * bsz * h * w * cmid * c * kk * kk
        f2 = 2 * bsz * h * w * cmid * c if w2 is not None else 0
        flops = (f1 + f2) / (2 if w2 is not None else 1)
        timeit(f"conv {h}x{w}x{c}(->{cmid}) k{kk} [{label}]", prog,
               flops, x, w1, w2)

    conv_chain(8, 200, 336, 64, 3, "res2 3x3")
    conv_chain(8, 100, 168, 128, 3, "res3 3x3")
    conv_chain(8, 50, 84, 256, 3, "res4 3x3")
    conv_chain(8, 25, 42, 512, 3, "res5 3x3")
    conv_chain(8, 200, 336, 256, 1, "res2 1x1 pair", cmid=64)
    conv_chain(8, 200, 336, 256, 3, "rpn/fpn 3x3 p2")
    conv_chain(8, 200, 336, 128, 3, "semseg 3x3 s4")

    # --- f32 for reference ----------------------------------------------
    x, b1, b2 = (mk((4096, 4096), jnp.float32),
                 mk((4096, 4096), jnp.float32),
                 mk((4096, 4096), jnp.float32))

    @jax.jit
    def prog32(x, b1, b2):
        def body(_, x):
            return ((x @ b1) @ b2) * jnp.float32(1e-3)
        return jax.lax.fori_loop(0, CHAIN // 2, body, x)[0, 0]

    timeit("matmul 4096^3 f32(default prec)", prog32, 2 * 4096 ** 3,
           x, b1, b2)


if __name__ == "__main__":
    main()
