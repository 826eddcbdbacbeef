"""Micro-benchmark: per-ROI window DMA patterns for the Pallas pooler.

Compares, at the 8k-ROI cascade workload:
  (a) current: copy (WY, WX, C) from (B, H, W, C) with the x origin aligned
      DOWN to a multiple of 8 (Mosaic sublane-offset rule) -> 7 cells slack;
  (b) flat:    copy (WY, WX*C) from (B, H, W*C) — the x origin becomes a
      lane-dim offset ox*C (a multiple of 256, i.e. lane-tile aligned), so
      NO alignment slack and WX can shrink to span+4.

If (b) is legal and at least as fast per byte, the pooler's window can drop
from 40x32 to 32x32 (and the small tier from 24x16 to 16x16) for identical
outputs.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("device:", jax.devices()[0].device_kind, flush=True)

    B, H, W, C = 8, 200, 336, 256
    G = 8          # ROIs per grid step
    N = 8000
    rng = np.random.RandomState(0)
    feat = jnp.array(rng.randn(B, H, W, C).astype(np.float32),
                     dtype=jnp.bfloat16)

    def make_origins(wy, wx, align):
        oy = rng.randint(0, H - wy, N).astype(np.int32)
        ox = rng.randint(0, W - wx - 8, N).astype(np.int32)
        if align:
            ox = (ox // 8) * 8
        b = rng.randint(0, B, N).astype(np.int32)
        return jnp.array(oy), jnp.array(ox), jnp.array(b)

    def kernel_3d(oy_ref, ox_ref, b_ref, feat_ref, out_ref, win_ref, sems,
                  *, wy, wx, g):
        step = pl.program_id(0)
        for j in range(g):
            roi = step * g + j
            pltpu.make_async_copy(
                feat_ref.at[b_ref[roi], pl.ds(oy_ref[roi], wy),
                            pl.ds(pl.multiple_of(ox_ref[roi], 8), wx), :],
                win_ref.at[j], sems.at[j],
            ).start()
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(g):
            pltpu.make_async_copy(
                feat_ref.at[0, pl.ds(0, wy), pl.ds(0, wx), :],
                win_ref.at[j], sems.at[j],
            ).wait()
            w = win_ref[j].astype(jnp.float32)
            acc = acc + w.reshape(-1, 8, 128).sum(0)
        out_ref[:] = acc

    def kernel_flat(oy_ref, ox_ref, b_ref, feat_ref, out_ref, win_ref, sems,
                    *, wy, wx, g, c):
        step = pl.program_id(0)
        for j in range(g):
            roi = step * g + j
            ox = pl.multiple_of(ox_ref[roi] * c, 256)
            pltpu.make_async_copy(
                feat_ref.at[b_ref[roi], pl.ds(oy_ref[roi], wy),
                            pl.ds(ox, wx * c)],
                win_ref.at[j], sems.at[j],
            ).start()
        acc = jnp.zeros((8, 128), jnp.float32)
        for j in range(g):
            pltpu.make_async_copy(
                feat_ref.at[0, pl.ds(0, wy), pl.ds(0, wx * c)],
                win_ref.at[j], sems.at[j],
            ).wait()
            w = win_ref[j].astype(jnp.float32)
            acc = acc + w.reshape(-1, 8, 128).sum(0)
        out_ref[:] = acc

    def build(mode, wy, wx):
        oy, ox, b = make_origins(wy, wx, align=(mode == "3d"))
        if mode == "3d":
            kern = functools.partial(kernel_3d, wy=wy, wx=wx, g=G)
            scratch = pltpu.VMEM((G, wy, wx, C), jnp.bfloat16)
            f = feat
        else:
            kern = functools.partial(kernel_flat, wy=wy, wx=wx, g=G, c=C)
            scratch = pltpu.VMEM((G, wy, wx * C), jnp.bfloat16)
            f = feat.reshape(B, H, W * C)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(N // G,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[scratch, pltpu.SemaphoreType.DMA((G,))],
        )
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return jax.jit(fn), (oy, ox, b, f)

    def timeit(name, fn_args, iters=30, gb=None):
        fn, args = fn_args
        out = fn(*args)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        bw = f"  {gb / dt:6.1f} GB/s" if gb else ""
        print(f"{name:34s} {dt * 1e3:7.2f} ms{bw}", flush=True)

    for name, mode, wy, wx in [
        ("3d  40x32 (current)", "3d", 32, 40),
        ("flat 40x32",          "flat", 32, 40),
        ("flat 32x32",          "flat", 32, 32),
        ("flat 16x16",          "flat", 16, 16),
        ("3d  24x16 (small tier)", "3d", 16, 24),
    ]:
        gb = N * wy * wx * C * 2 / 1e9
        try:
            timeit(f"{name} [{gb:.2f} GB]", build(mode, wy, wx), gb=gb)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
