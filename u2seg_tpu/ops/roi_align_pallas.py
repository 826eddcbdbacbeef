"""Pallas TPU kernel for ROIAlign.

Performance path behind the same semantics as ``ops.roi_align.roi_align``
(aligned=True, static sampling_ratio). The XLA-gather formulation streams
R*S*S*r*r*4 feature vectors through HBM with scattered reads; this kernel
instead, per ROI:

  1. (scalar prefetch) reads the ROI's integer window origin,
  2. DMAs one fixed WINxWIN spatial window of the feature map HBM->VMEM,
  3. builds the separable bilinear weight matrices Wy (S*r, WIN) and
     Wx (S*r, WIN) with VPU arithmetic (relu(1-|coord-cell|)),
  4. computes out = Wy @ window @ Wx^T as two MXU matmuls,
  5. average-pools r x r samples per bin.

Window clamping: samples that fall outside the WIN window contribute zero
(same as out-of-image zero padding); WIN is sized so that any ROI assigned
to a level by the canonical FPN heuristic fits with margin.

The separable trick is exact because bilinear interpolation of an
axis-aligned grid factorizes: value(y, x) = sum_ij wy_i(y) wx_j(x) F[i, j].
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 48  # feature-cell window per ROI (covers level-routed ROI spans)


def _roi_align_kernel(
    # scalar prefetch
    origin_ref,        # (R, 2) int32 window origin (y, x) clamped
    batch_ref,         # (R,) int32 image index
    meta_ref,          # (R, 4) f32: y0, x0, bin_h, bin_w (feature coords)
    # inputs
    feat_ref,          # (B, H, W, C) in ANY/HBM
    # outputs
    out_ref,           # (1, S*r, S*r, C) block per ROI (pooled later)
    # scratch
    win_ref,           # (WIN, WIN, C) VMEM
    sem,               # DMA semaphore
    *,
    s: int,
    r: int,
    h: int,
    w: int,
):
    roi = pl.program_id(0)
    oy = origin_ref[roi, 0]
    ox = origin_ref[roi, 1]
    b = batch_ref[roi]

    # DMA the window for this ROI
    copy = pltpu.make_async_copy(
        feat_ref.at[b, pl.ds(oy, WIN), pl.ds(ox, WIN), :],
        win_ref,
        sem,
    )
    copy.start()

    # sample coordinates along each axis (relative to window origin)
    y0 = meta_ref[roi, 0]
    x0 = meta_ref[roi, 1]
    bin_h = meta_ref[roi, 2]
    bin_w = meta_ref[roi, 3]

    n = s * r
    offs = (jax.lax.broadcasted_iota(jnp.float32, (n, 1), 0) // r)
    sub = (jax.lax.broadcasted_iota(jnp.float32, (n, 1), 0) % r + 0.5) / r
    rel = offs + sub                                   # (n, 1)
    ys = y0 + rel[:, 0] * bin_h                        # (n,) feature coords
    xs = x0 + rel[:, 0] * bin_w

    def axis_weights(coords, size, origin):
        # reference semantics: contribute 0 outside [-1, size]; clamp into
        # [0, size-1]; then express as relu(1 - |coord - cell|) over the
        # window cells.
        inside = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1.0)
        local = cc - origin.astype(jnp.float32)        # (n,)
        cells = jax.lax.broadcasted_iota(jnp.float32, (n, WIN), 1)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, None] - cells))
        return wgt * inside[:, None]

    wy = axis_weights(ys, float(h), oy)                # (n, WIN)
    wx = axis_weights(xs, float(w), ox)                # (n, WIN)

    copy.wait()
    window = win_ref[:].astype(jnp.float32)            # (WIN, WIN, C)
    c = window.shape[-1]
    # out[n1, n2, c] = sum_{i,j} wy[n1,i] wx[n2,j] window[i,j,c]
    tmp = jax.lax.dot_general(
        wy, window.reshape(WIN, WIN * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, WIN, c)                               # (n, WIN, C)
    out = jax.lax.dot_general(
        wx, tmp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # hmm: see below
    # dot_general above contracts wx's WIN with tmp's WIN producing
    # (n2, n1, C); transpose to (n1, n2, C)
    out = out.transpose(1, 0, 2)
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio"),
)
def roi_align_pallas(
    features: jnp.ndarray,     # (B, H, W, C)
    boxes: jnp.ndarray,        # (R, 4) XYXY image coords
    batch_idx: jnp.ndarray,    # (R,) int32
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Pallas ROIAlign (aligned=True). Returns (R, S, S, C) float32."""
    if sampling_ratio <= 0:
        sampling_ratio = 2
    s, r = output_size, sampling_ratio
    b, h, w, c = features.shape
    n_roi = boxes.shape[0]
    n = s * r

    fb = boxes.astype(jnp.float32) * spatial_scale
    y0 = fb[:, 1] - 0.5
    x0 = fb[:, 0] - 0.5
    roi_h = fb[:, 3] - fb[:, 1]
    roi_w = fb[:, 2] - fb[:, 0]
    bin_h = roi_h / s
    bin_w = roi_w / s
    meta = jnp.stack([y0, x0, bin_h, bin_w], axis=1)

    # window origin: floor(first sample)-1, clamped so the window fits
    first_y = jnp.floor(y0 + bin_h * (0.5 / r)) - 1
    first_x = jnp.floor(x0 + bin_w * (0.5 / r)) - 1
    oy = jnp.clip(first_y, 0, max(h - WIN, 0)).astype(jnp.int32)
    ox = jnp.clip(first_x, 0, max(w - WIN, 0)).astype(jnp.int32)
    origin = jnp.stack([oy, ox], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_roi,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # features stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, n, n, c), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((WIN, WIN, c), features.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_roi_align_kernel, s=s, r=r, h=h, w=w)
    samples = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_roi, n, n, c), jnp.float32),
        grid_spec=grid_spec,
    )(origin, batch_idx.astype(jnp.int32), meta, features)

    samples = samples.reshape(n_roi, s, r, s, r, c)
    return jnp.mean(samples, axis=(2, 4))
