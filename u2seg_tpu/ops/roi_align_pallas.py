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
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 40    # x window per ROI; the x origin is aligned DOWN to a multiple
            # of 8 (Mosaic DMA requirement), costing up to 7 cells of slack
WIN_Y = 32  # y window: no alignment requirement, no slack

# Largest box span (in feature cells) the windows cover EXACTLY, halos
# included. Bilinear sampling of a span needs floor(first)-1 .. floor(last)+1
# = up to span+4 cells per axis: y budget = WIN_Y - 4; x budget = WIN - 11
# (4 halo cells + 7 alignment slack). Boxes whose long side exceeds this at
# their canonical level are routed one level coarser (window-fit bump), and
# boxes too large even for the top REAL level go to a VIRTUAL level — a 2x
# average-pool of the top level appended internally — so no in-image box
# ever edge-clamps (28 cells at the virtual stride 64 covers 1792 px).
SPAN_BUDGET = min(WIN - 11, WIN_Y - 4)

# Small-window tier, chosen PER ROI PER AXIS: a ROI whose y (x) span fits
# the small budget DMAs only WIN_S_Y (WIN_S_X) cells along that axis —
# identical values, a fraction of the HBM traffic (the window DMA is what
# bounds the pooler). Budgets: y 16-4=12 cells, x 24-11=13 cells including
# the bilinear halo and the 8-alignment slack.
WIN_S_Y = 16
WIN_S_X = 24

# tier code = small_y + 2 * small_x -> DMA extents
_TIER_DIMS = (
    (WIN_Y, WIN), (WIN_S_Y, WIN), (WIN_Y, WIN_S_X), (WIN_S_Y, WIN_S_X),
)


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
    ox = pl.multiple_of(origin_ref[roi, 1], 8)
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
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    offs = (idx_i // r).astype(jnp.float32)
    sub = ((idx_i % r).astype(jnp.float32) + 0.5) / r
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
        cells = jax.lax.broadcasted_iota(jnp.int32, (n, WIN), 1).astype(
            jnp.float32
        )
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
    # x-origin aligned down to the 8-sublane HBM tiling (Mosaic requires
    # provably 8-divisible dynamic W offsets for the window DMA)
    ox = jnp.clip(first_x, 0, max(w - WIN, 0)).astype(jnp.int32) // 8 * 8
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


# ---------------------------------------------------------------------------
# Multilevel (FPN) variant: per-ROI level routing with predicated DMA
# ---------------------------------------------------------------------------

def _rois_per_step(s: int) -> int:
    """ROIs per grid step. Bounded by VMEM (2 double-buffered WIN^2*C
    windows plus (g*s, WIN*C) matmul temporaries per slot) and by the g^2
    FLOP growth of the block-diagonal matmuls — 8 is the measured sweet
    spot for the 7x7 box pool on v5e, halved for the 14x14 mask pool whose
    temporaries are 4x larger."""
    import os
    env = os.environ.get("U2SEG_POOL_GSZ")
    if env:
        return int(env)     # experimental override for kernel sweeps
    return 8 if s <= 8 else 4
                   # amortizes per-step launch overhead


def _ml_kernel(
    gtier_ref,         # (nsteps,) int32 tier of each g-ROI group — groups
                       # are tier-uniform BY CONSTRUCTION (host bucket-pads
                       # each tier to a multiple of g)
    oy_ref,            # (R,) int32 ATLAS-row origins packed large|small<<16
    ox_ref,            # (R,) int32 aligned x origins packed large|small<<16
    bat_ref,           # (R,) int32 batch index
    ro_ref,            # (R,) int32 atlas row offset of the ROI's level —
                       # subtracted from the atlas origin to recover the
                       # LEVEL-frame origin the bilinear weights need
    hw_ref,            # (R,) int32 true level dims packed h | w << 16
    y0_ref,            # (R,) f32 roi start y (level coords)
    x0_ref,            # (R,) f32
    binh_ref,          # (R,) f32 bin sizes
    binw_ref,          # (R,) f32
    atlas_ref,         # (B, H_cat, W_max, C) ANY — levels row-concatenated
    out_ref,           # (G, s, s, C) block
    win_ref,           # (2, G, WIN_Y, WIN, C) scratch
    sems,              # (2,) DMA semaphores — one per buffer slot; the
                       # whole group's copies signal it and one fat wait
                       # consumes them
    *,
    s: int,
    r: int,
    g: int,            # ROIs per grid step
):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    # Scalar-core economics drive this kernel's shape. Mosaic predication
    # EXECUTES the address arithmetic of every pl.when body and only
    # predicates the side effects, so the scalar cost per step is the sum
    # over ALL predicated blocks — an earlier per-ROI level x tier
    # branching variant was bound at ~1.9 us/ROI of scalar work with the
    # DMA engines idle (pool time flat across box-size mixes). Hence:
    #   * ONE feature ref: the FPN levels are row-concatenated into an
    #     atlas and the level is absorbed into the (precomputed) atlas-row
    #     origin — no per-level branches exist at all;
    #   * tiers are per GROUP: the host sorts ROIs by tier and pads each
    #     tier bucket to a multiple of g, so a group's DMA extents are one
    #     of 4 static shapes selected by one scalar read.
    #
    # Adaptive windows: each ROI DMAs only the (wy_e, wx_e) extent its
    # span needs — tier 0..3 selects (32,40)/(16,40)/(32,24)/(16,24); axis
    # weights are exactly zero beyond the small extents (see _ml_prep's
    # small-tier origin clamps), so reading the full (32, 40) buffer in
    # the matmul with stale values in the un-DMA'd remainder is exact
    # PROVIDED the stale values are finite (0 * Inf/NaN would poison the
    # MXU sum). Groups 0 and 1 therefore force the FULL window (from the
    # large-tier origins): after the two warmup groups every (slot, j)
    # buffer holds real feature values everywhere, and later small-tier
    # DMAs leave only old finite features behind. Launch, wait, and
    # compute all derive the effective tier with the same grp<2 rule.
    def eff_tier(grp):
        return jnp.where(grp < 2, 0, gtier_ref[grp])

    def eff_origins(grp, roi):
        t = eff_tier(grp)
        pk_y, pk_x = oy_ref[roi], ox_ref[roi]
        oy = jnp.where(t % 2 == 1, pk_y >> 16, pk_y & 0xFFFF)
        ox = jnp.where(t // 2 == 1, pk_x >> 16, pk_x & 0xFFFF)
        return oy, ox

    def launch_group(grp, slot):
        # start all window DMAs of group `grp` into buffer `slot` (static)
        tc = eff_tier(grp)
        for t, (wy_e, wx_e) in enumerate(_TIER_DIMS):
            @pl.when(tc == t)
            def _(t=t, slot=slot, wy_e=wy_e, wx_e=wx_e):
                for j in range(g):
                    roi = grp * g + j
                    pk_y, pk_x = oy_ref[roi], ox_ref[roi]
                    oy = (pk_y >> 16) if t % 2 == 1 else (pk_y & 0xFFFF)
                    ox = (pk_x >> 16) if t // 2 == 1 else (pk_x & 0xFFFF)
                    ox = pl.multiple_of(ox, 8)
                    pltpu.make_async_copy(
                        atlas_ref.at[bat_ref[roi], pl.ds(oy, wy_e),
                                     pl.ds(ox, wx_e), :],
                        win_ref.at[slot, j, :wy_e, :wx_e],
                        sems.at[slot],
                    ).start()

    # Double buffering: group i's windows start at step i-1 (group 0 at
    # warmup), so the DMAs of step+1 overlap this step's matmuls. Buffer
    # slots are STATIC (chosen by step-parity pl.when branches) — dynamic
    # semaphore indexing miscompiles on the TPU backend.
    parity = step % 2 == 0

    @pl.when(step == 0)
    def _():
        launch_group(0, 0)

    @pl.when((step + 1 < nsteps) & parity)
    def _():
        launch_group(step + 1, 1)

    @pl.when((step + 1 < nsteps) & jnp.logical_not(parity))
    def _():
        launch_group(step + 1, 0)

    n = s * r
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    offs = (idx_i // r).astype(jnp.float32)
    sub = ((idx_i % r).astype(jnp.float32) + 0.5) / r
    rel = (offs + sub)[:, 0]

    def axis_weights_pooled(coords, size, origin, win):
        """(s, win) separable weights with the r-sample mean pool FOLDED in
        (the pool is linear, so averaging the r per-bin sample weights along
        each axis equals averaging the r*r interpolated samples)."""
        inside = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1.0)
        # clamp into the window so rare overflowing samples take the edge
        # cell instead of vanishing (level routing keeps spans <= window)
        local = jnp.clip(cc - origin.astype(jnp.float32), 0.0, win - 1.0)
        cells = jax.lax.broadcasted_iota(jnp.int32, (n, win), 1).astype(
            jnp.float32
        )
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, None] - cells))
        wgt = wgt * inside[:, None]
        return wgt.reshape(s, r, win).sum(axis=1) * (1.0 / r)

    def compute_group(slot):
        # Per-ROI (s, WIN) matmuls are pad-dominated on the MXU (M=s=7 and
        # K=WIN=40 both round up to 128). Stack the group into ONE
        # block-diagonal matmul pair: lhs (g*s, g*WIN) with each ROI's
        # weights on the diagonal block, rhs the g windows stacked along
        # the contraction axis — g x fewer MXU launches and ~g x better
        # M/K tile occupancy for the same results.
        wys, wxs = [], []
        for j in range(g):
            roi = step * g + j
            y0 = y0_ref[roi]
            x0 = x0_ref[roi]
            bin_h = binh_ref[roi]
            bin_w = binw_ref[roi]
            hw = hw_ref[roi]
            h = (hw & 0xFFFF).astype(jnp.float32)
            w = (hw >> 16).astype(jnp.float32)

            ys = y0 + rel * bin_h
            xs = x0 + rel * bin_w
            oy, ox = eff_origins(step, roi)
            oy_level = oy - ro_ref[roi]      # atlas row -> level frame
            wys.append(axis_weights_pooled(ys, h, oy_level, WIN_Y))
            wxs.append(axis_weights_pooled(xs, w, pl.multiple_of(ox, 8), WIN))

        # block-diagonalize: tile the stacked (g*s, WIN) weights across g
        # column blocks and zero every off-diagonal block
        def block_diag(cat, win):
            row_blk = jax.lax.broadcasted_iota(
                jnp.int32, (g * s, g * win), 0) // s
            col_blk = jax.lax.broadcasted_iota(
                jnp.int32, (g * s, g * win), 1) // win
            on_diag = (row_blk == col_blk).astype(jnp.float32)
            return jnp.concatenate([cat] * g, axis=1) * on_diag

        wy_blk = block_diag(jnp.concatenate(wys, axis=0), WIN_Y)
        wx_blk = block_diag(jnp.concatenate(wxs, axis=0), WIN)

        # wait for this group's windows (later groups' DMAs stay in
        # flight). All g copies of a group signal ONE semaphore (bytes
        # accumulate), so a single wait whose descriptor spans the whole
        # (g, wy_e, wx_e, C) slot covers the group — 4 predicated waits
        # per step instead of 4*g (the per-descriptor scalar setup was a
        # measurable slice of the kernel's ~1.9 us/ROI scalar bound).
        # The descriptor is self-referential (src = dst): wait() only
        # consumes the byte count; tier predication keeps it equal to
        # the sum of the launched copies' bytes.
        tc = eff_tier(step)
        for t, (wy_e, wx_e) in enumerate(_TIER_DIMS):
            @pl.when(tc == t)
            def _(wy_e=wy_e, wx_e=wx_e):
                pltpu.make_async_copy(
                    win_ref.at[slot, :, :wy_e, :wx_e],
                    win_ref.at[slot, :, :wy_e, :wx_e],
                    sems.at[slot],
                ).wait()
        # matmul1 runs in the window dtype (bf16 on the bf16 compute path,
        # f32 accumulate) — the reference pools under fp16 autocast, so
        # bf16 interpolation weights are within the reference's own AMP
        # precision; it also avoids materializing an f32 window copy
        # (the VMEM cost would cap the group size)
        window = win_ref[slot]                             # (g, WIN_Y, WIN, C)
        c = window.shape[-1]
        tmp = jax.lax.dot_general(
            wy_blk.astype(window.dtype), window.reshape(g * WIN_Y, WIN * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (g*s, WIN*C)
        # contract x: row q*s+n1 holds tmp_q[n1, j, c]; regroup so each
        # ROI's WIN axis lines up with its diagonal block
        tmp = tmp.reshape(g, s, WIN, c).transpose(0, 2, 1, 3)
        out = jax.lax.dot_general(
            wx_blk, tmp.reshape(g * WIN, s * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (g*s, s*C): [q,n2 ; n1,c]
        out = out.reshape(g, s, s, c).transpose(0, 2, 1, 3)
        out_ref[:] = out.astype(out_ref.dtype)

    @pl.when(parity)
    def _():
        compute_group(0)

    @pl.when(jnp.logical_not(parity))
    def _():
        compute_group(1)


def _ml_kernel_prew(
    # scalar prefetch
    gtier_ref,         # (nsteps,) int32 effective tier per group (grp<2 -> 0
                       # already applied by the host)
    oy_ref,            # (R,) int32 atlas-row origins packed large|small<<16
    ox_ref,            # (R,) int32 aligned x origins packed large|small<<16
    bat_ref,           # (R,) int32 batch index
    # inputs
    atlas_ref,         # (B, H_cat, W_max, C) ANY — levels row-concatenated
    wy_ref,            # (1, g*s, g*WIN_Y) VMEM block — PRECOMPUTED
                       # block-diagonal y weights for this step's group
    wx_ref,            # (1, g*s, g*WIN) VMEM block — x weights
    # outputs
    out_ref,           # (G, s, s, C) block
    # scratch
    win_ref,           # (2, G, WIN_Y, WIN, C)
    sems,              # (2,) DMA semaphores
    *,
    s: int,
    g: int,
):
    """Streamed-weight variant of ``_ml_kernel``: the per-ROI separable
    bilinear weights (including their tier-origin and boundary clamps) are
    precomputed block-diagonal by vectorized XLA on the host side of the
    call and pipelined in as ordinary grid inputs, so the kernel body is
    ONLY: window DMAs (tier-predicated), one fat wait, two MXU matmuls and
    the mid relayout. This removes all per-ROI VPU weight math and 6 SMEM
    scalar streams from the hot loop (measured: the kernel is per-step
    overhead bound, NOT DMA bound — pool time is flat across box sizes)."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    _ABL = os.environ.get("U2SEG_POOL_ABLATE", "")  # dev: "nodma" | "nomm"

    def launch_group(grp, slot):
        tc = gtier_ref[grp]
        for t, (wy_e, wx_e) in enumerate(_TIER_DIMS):
            @pl.when(tc == t)
            def _(t=t, slot=slot, wy_e=wy_e, wx_e=wx_e):
                for j in range(g):
                    roi = grp * g + j
                    pk_y, pk_x = oy_ref[roi], ox_ref[roi]
                    oy = (pk_y >> 16) if t % 2 == 1 else (pk_y & 0xFFFF)
                    ox = (pk_x >> 16) if t // 2 == 1 else (pk_x & 0xFFFF)
                    ox = pl.multiple_of(ox, 8)
                    pltpu.make_async_copy(
                        atlas_ref.at[bat_ref[roi], pl.ds(oy, wy_e),
                                     pl.ds(ox, wx_e), :],
                        win_ref.at[slot, j, :wy_e, :wx_e],
                        sems.at[slot],
                    ).start()

    parity = step % 2 == 0

    if _ABL != "nodma":
        @pl.when(step == 0)
        def _():
            launch_group(0, 0)

        @pl.when((step + 1 < nsteps) & parity)
        def _():
            launch_group(step + 1, 1)

        @pl.when((step + 1 < nsteps) & jnp.logical_not(parity))
        def _():
            launch_group(step + 1, 0)

    if _ABL == "noop":
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
        return

    def compute_group(slot):
        if _ABL == "nodma":
            window = win_ref[slot]
            c = window.shape[-1]
            out_ref[:] = jnp.zeros_like(out_ref) if False else out_ref[:]
        if _ABL == "nomm":
            tc = gtier_ref[step]
            for t, (wy_e, wx_e) in enumerate(_TIER_DIMS):
                @pl.when(tc == t)
                def _(wy_e=wy_e, wx_e=wx_e):
                    pltpu.make_async_copy(
                        win_ref.at[slot, :, :wy_e, :wx_e],
                        win_ref.at[slot, :, :wy_e, :wx_e],
                        sems.at[slot],
                    ).wait()
            out_ref[:] = win_ref[slot, :, :s, :s, :].astype(out_ref.dtype)
            return
        if _ABL != "nodma":
            tc = gtier_ref[step]
            for t, (wy_e, wx_e) in enumerate(_TIER_DIMS):
                @pl.when(tc == t)
                def _(wy_e=wy_e, wx_e=wx_e):
                    pltpu.make_async_copy(
                        win_ref.at[slot, :, :wy_e, :wx_e],
                        win_ref.at[slot, :, :wy_e, :wx_e],
                        sems.at[slot],
                    ).wait()
        window = win_ref[slot]                             # (g, WIN_Y, WIN, C)
        c = window.shape[-1]
        # Measured dead ends (dev/profile_pool_tier.py ablations): the
        # kernel is MXU-operand-stream bound — time is flat across box
        # sizes (DMA extents), group sizes, wait coalescing, and weight
        # precompute. Rounding tmp to bf16 to halve matmul2's ingest made
        # it SLOWER (17.2 vs 14.5 ms: the f32->bf16 convert + 16-sublane
        # bf16 relayout cost more than the ingest saved), so tmp stays f32.
        tmp = jax.lax.dot_general(
            wy_ref[0].astype(window.dtype),
            window.reshape(g * WIN_Y, WIN * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (g*s, WIN*C)
        tmp = tmp.reshape(g, s, WIN, c).transpose(0, 2, 1, 3)
        out = jax.lax.dot_general(
            wx_ref[0], tmp.reshape(g * WIN, s * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (g*s, s*C)
        out = out.reshape(g, s, s, c).transpose(0, 2, 1, 3)
        out_ref[:] = out.astype(out_ref.dtype)

    @pl.when(parity)
    def _():
        compute_group(0)

    @pl.when(jnp.logical_not(parity))
    def _():
        compute_group(1)


def _pooled_axis_weights_host(
    c0: jnp.ndarray,        # (R,) f32 roi start coord (level frame)
    binsz: jnp.ndarray,     # (R,) f32 bin size
    origin: jnp.ndarray,    # (R,) int32 effective window origin
    size: jnp.ndarray,      # (R,) f32 true level extent along this axis
    s: int, r: int, win: int,
) -> jnp.ndarray:
    """Vectorized replica of the kernel's ``axis_weights_pooled`` over all
    ROI slots: (R, s, win) f32 with the r-sample mean pool folded in."""
    n = s * r
    idx = jnp.arange(n, dtype=jnp.float32)
    rel = jnp.floor(idx / r) + ((idx % r) + 0.5) / r           # (n,)
    coords = c0[:, None] + rel[None, :] * binsz[:, None]       # (R, n)
    inside = (coords >= -1.0) & (coords <= size[:, None])
    cc = jnp.clip(coords, 0.0, jnp.maximum(size[:, None] - 1.0, 0.0))
    local = jnp.clip(
        cc - origin[:, None].astype(jnp.float32), 0.0, win - 1.0)
    cells = jnp.arange(win, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(local[..., None] - cells))
    wgt = wgt * inside[..., None]                              # (R, n, win)
    return wgt.reshape(-1, s, r, win).sum(axis=2) * (1.0 / r)


def _block_diag_weights(w: jnp.ndarray, g: int, dtype) -> jnp.ndarray:
    """(nsteps*g, s, win) per-slot weights -> (nsteps, g*s, g*win)
    block-diagonal blocks, one per kernel step."""
    r_cap, s, win = w.shape
    nsteps = r_cap // g
    eye = jnp.eye(g, dtype=w.dtype)
    blk = jnp.einsum(
        "tqnj,qp->tqnpj", w.reshape(nsteps, g, s, win), eye)
    return blk.reshape(nsteps, g * s, g * win).astype(dtype)


def _padded_dims(dims) -> Tuple[Tuple[int, int], ...]:
    """Zero-padded level dims so an 8-aligned WINxWIN window always fits."""
    out = []
    for h, w in dims:
        ph = max(h, WIN)
        # pad W so the aligned window always fits (multiple of 8, >= WIN+8)
        pw = max(((w + 7) // 8) * 8, WIN + 8)
        out.append((ph, pw))
    return tuple(out)


def _ml_prep(
    boxes: jnp.ndarray,
    dims: Tuple[Tuple[int, int], ...],
    strides: Tuple[int, ...],
    s: int,
    r: int,
    canonical_box_size: float,
    canonical_level: int,
    n_virtual: int = 1,
    win_y: int = WIN_Y,
    win_x: int = WIN,
):
    """Shared routing/window math for the multilevel kernel, its pure-JAX
    reference, and the hand-derived backward: per-ROI level (with the
    window-fit bump), window origins, and bin geometry in level coords.

    ``dims``/``strides`` include ``n_virtual`` trailing virtual levels
    (2x average-pools of the top real level, see _append_virtual_level);
    canonical sqrt-area routing only targets REAL levels — virtual levels
    are reachable exclusively through the window-fit bump.
    """
    import math as _math

    from u2seg_tpu.ops.roi_align import assign_boxes_to_levels

    num_levels = len(dims)
    min_level = int(_math.log2(strides[0]))
    levels = assign_boxes_to_levels(
        boxes, min_level, min_level + num_levels - 1 - n_virtual,
        canonical_box_size, canonical_level,
    )
    lvl = (levels - min_level).astype(jnp.int32)
    # window-fit routing: boxes whose long side exceeds the exact window
    # budget at their canonical level are bumped to a coarser level (a
    # deliberate deviation from the reference's sqrt-area-only routing;
    # affects only aspect ratios beyond ~3 and giant boxes, which land on
    # the virtual level instead of clamping)
    max_side = jnp.maximum(
        boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
    )
    stride0 = jnp.asarray(np.asarray(strides, np.float32))[lvl]
    need = jnp.ceil(
        jnp.log2(jnp.maximum(max_side / stride0 / SPAN_BUDGET, 1e-6))
    ).astype(jnp.int32)
    lvl = jnp.clip(lvl + jnp.maximum(need, 0), 0, num_levels - 1)

    pdims = _padded_dims(dims)
    stride_r = jnp.asarray(np.asarray(strides, np.float32))[lvl]
    fb = boxes.astype(jnp.float32) / stride_r[:, None]
    y0 = fb[:, 1] - 0.5
    x0 = fb[:, 0] - 0.5
    bin_h = (fb[:, 3] - fb[:, 1]) / s
    bin_w = (fb[:, 2] - fb[:, 0]) / s

    pad_h = jnp.asarray([d[0] for d in pdims], jnp.int32)[lvl]
    pad_w = jnp.asarray([d[1] for d in pdims], jnp.int32)[lvl]
    first_y = jnp.floor(y0 + bin_h * (0.5 / r)) - 1
    first_x = jnp.floor(x0 + bin_w * (0.5 / r)) - 1
    oy = jnp.clip(first_y, 0, (pad_h - win_y).astype(jnp.float32)).astype(jnp.int32)
    # align x-origin down to 8 (Mosaic-required for dynamic W DMA offsets)
    ox = jnp.clip(first_x, 0, (pad_w - win_x).astype(jnp.float32)).astype(jnp.int32)
    ox = ox // 8 * 8
    return dict(lvl=lvl, oy=oy, ox=ox, y0=y0, x0=x0, bin_h=bin_h,
                bin_w=bin_w, pdims=pdims)


def _append_virtual_level(features, strides):
    """Append a 2x average-pool of the top level as a VIRTUAL routing level.

    Boxes too large for the exact window budget at the top real level are
    routed here by the window-fit bump instead of edge-clamping. Odd top
    dims are edge-padded so the last pooled cell averages duplicated edge
    rows/cols. Plain JAX (differentiable) so the train pooler's custom VJP
    chains the virtual-level gradient back through the pool automatically.
    """
    f = features[-1]
    b, h, w, c = f.shape
    ph, pw = h + (h % 2), w + (w % 2)
    if ph != h or pw != w:
        f = jnp.pad(f, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)),
                    mode="edge")
    pooled = f.reshape(b, ph // 2, 2, pw // 2, 2, c).mean(axis=(2, 4))
    return list(features) + [pooled], tuple(strides) + (2 * strides[-1],)


def multilevel_roi_align_pallas(
    features,                  # list of (B, H_l, W_l, C), fine -> coarse
    boxes: jnp.ndarray,        # (R, 4) XYXY image coords
    batch_idx: jnp.ndarray,
    output_size: int,
    strides: Tuple[int, ...],
    sampling_ratio: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    out_dtype=None,            # None -> float32; bf16 on the inference path
) -> jnp.ndarray:
    """FPN ROIPooler as one Pallas kernel: scalar-prefetched level routing,
    one WINxWIN window DMA from the assigned level, separable-matmul
    interpolation. Levels smaller than WIN are zero-padded up front (the
    axis weights vanish outside the true level size, so padding is exact).
    """
    features, strides = _append_virtual_level(features, tuple(strides))
    return _ml_pallas_ext(
        features, boxes, batch_idx, output_size, strides,
        sampling_ratio, canonical_box_size, canonical_level,
        out_dtype=out_dtype,
    )


def _ml_call(atlas, prep_arrays, output_size, r, gsz, r_cap, out_dtype,
             prew=None):
    """One pallas_call over all ROIs: tier-uniform groups, one atlas ref.

    ``prew``: optional (wy_blk, wx_blk) precomputed block-diagonal weights
    (nsteps, g*s, g*WIN_[YX]) — selects the streamed-weight kernel."""
    s = output_size
    c = atlas.shape[-1]
    scratch = [
        pltpu.VMEM((2, gsz, WIN_Y, WIN, c), atlas.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out_spec = pl.BlockSpec(
        (gsz, s, s, c), lambda i, *_: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if prew is not None:
        wy_blk, wx_blk = prew
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(r_cap // gsz,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, gsz * s, gsz * WIN_Y),
                             lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, gsz * s, gsz * WIN),
                             lambda i, *_: (i, 0, 0)),
            ],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        kernel = functools.partial(_ml_kernel_prew, s=s, g=gsz)
        extra = (atlas, wy_blk, wx_blk)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=10,
            grid=(r_cap // gsz,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        kernel = functools.partial(_ml_kernel, s=s, r=r, g=gsz)
        extra = (atlas,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (r_cap, s, s, c), jnp.dtype(out_dtype or jnp.float32)),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # v5e VMEM is far larger than the compiler's conservative 16MB
            # scoped default; the window buffers are the whole point here
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*prep_arrays, *extra)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "strides", "sampling_ratio",
                     "canonical_box_size", "canonical_level", "out_dtype"),
)
def _ml_pallas_ext(
    features,                  # EXTENDED list (last level is virtual)
    boxes: jnp.ndarray,
    batch_idx: jnp.ndarray,
    output_size: int,
    strides: Tuple[int, ...],
    sampling_ratio: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
    out_dtype=None,
) -> jnp.ndarray:
    if sampling_ratio <= 0:
        sampling_ratio = 2
    s, r = output_size, sampling_ratio
    b, _, _, c = features[0].shape
    n_roi = boxes.shape[0]
    gsz = _rois_per_step(s)
    # bucket-padding bound: each of the 4 tier buckets is padded to a
    # multiple of gsz so every kernel group is tier-uniform (the kernel
    # has NO mixed-group path)
    r_cap = ((n_roi + gsz - 1) // gsz + 4) * gsz

    dims = tuple((f.shape[1], f.shape[2]) for f in features)
    prep = _ml_prep(boxes, dims, strides, s, r,
                    canonical_box_size, canonical_level)
    # small-window origins per axis (identical routing; only the window
    # clamp differs) + the per-ROI tier code
    prep_s = _ml_prep(boxes, dims, strides, s, r,
                      canonical_box_size, canonical_level,
                      win_y=WIN_S_Y, win_x=WIN_S_X)
    small_y = prep["bin_h"] * s <= WIN_S_Y - 4
    small_x = prep["bin_w"] * s <= WIN_S_X - 11
    if os.environ.get("U2SEG_POOL_FORCE_FULL_WINDOW"):
        # sweep/test hook: disable the small tiers so every ROI DMAs the
        # full (WIN_Y, WIN) window. Adaptive tiers must be value-identical
        # to this (tests/ops/test_roi_align_pallas.py boundary cases).
        small_y = jnp.zeros_like(small_y)
        small_x = jnp.zeros_like(small_x)
    tier = small_y.astype(jnp.int32) + 2 * small_x.astype(jnp.int32)

    # ---- feature ATLAS: levels row-concatenated (zero-padded to a
    # common width) so the kernel sees ONE ref and the level routing is
    # absorbed into precomputed atlas-row origins. XLA CSEs the identical
    # concat across the cascade stages' pool calls within one jit.
    pdims = prep["pdims"]
    w_max = max(pw for _, pw in pdims)
    row_off_np = np.concatenate(
        [[0], np.cumsum([ph for ph, _ in pdims])[:-1]]).astype(np.int32)
    bands = []
    for f, (ph, pw) in zip(features, pdims):
        f = jnp.pad(f, ((0, 0), (0, ph - f.shape[1]),
                        (0, w_max - f.shape[2]), (0, 0)))
        bands.append(f)
    atlas = jnp.concatenate(bands, axis=1)        # (B, H_cat, W_max, C)

    row_off = jnp.asarray(row_off_np)[prep["lvl"]]
    # pack per-ROI scalars to fit SMEM (see _ml_kernel): atlas origins
    # large|small<<16 (both < 2^15); level dims h | w << 16
    oy_pk = (prep["oy"] + row_off) | ((prep_s["oy"] + row_off) << 16)
    ox_pk = prep["ox"] | (prep_s["ox"] << 16)
    true_h = jnp.asarray([d[0] for d in dims], jnp.int32)[prep["lvl"]]
    true_w = jnp.asarray([d[1] for d in dims], jnp.int32)[prep["lvl"]]
    hw_pk = true_h | (true_w << 16)

    # ---- tier-bucket scatter: sort ROIs by tier, pad each bucket to a
    # multiple of gsz, scatter into the length-r_cap kernel arrays.
    # Dummy rows (bucket padding + tail) carry origin 0 / batch 0 — a
    # window DMA from atlas[0, 0:, 0:, :] is always in bounds — and are
    # discarded by the final gather.
    order = jnp.argsort(tier, stable=True)                  # (R,)
    tier_sorted = tier[order]
    counts = jnp.bincount(tier, length=4)
    pc = (counts + gsz - 1) // gsz * gsz                    # padded counts
    base = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                            jnp.cumsum(pc)[:-1]])
    excl = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                            jnp.cumsum(counts)[:-1]])
    pos = (base[tier_sorted]
           + (jnp.arange(n_roi) - excl[tier_sorted])).astype(jnp.int32)

    def scat(x):
        out = jnp.zeros((r_cap,) + x.shape[1:], x.dtype)
        return out.at[pos].set(x[order])

    # per-group tier: group j (rows [j*gsz, (j+1)*gsz)) belongs to the
    # bucket whose base it has reached; tail groups read as tier 3
    # (smallest window — safe for dummy rows). Warmup groups 0 and 1 are
    # forced to tier 0 inside the kernel (grp < 2 rule).
    gi = jnp.arange(r_cap // gsz, dtype=jnp.int32) * gsz
    gtier = (jnp.sum(gi[:, None] >= base[None, 1:], axis=1)
             ).astype(jnp.int32)

    if os.environ.get("U2SEG_POOL_PREW", "1") != "0":
        # streamed-weight kernel: the per-ROI separable weights (with the
        # tier/warmup origin rules folded in) are built here by vectorized
        # XLA and pipelined into the kernel as ordinary grid inputs
        nsteps = r_cap // gsz
        gtier_eff = jnp.where(jnp.arange(nsteps) < 2, 0, gtier)
        grp_of_slot = jnp.arange(r_cap, dtype=jnp.int32) // gsz
        efft = gtier_eff[grp_of_slot]                       # (r_cap,)
        oy_pk_s, ox_pk_s = scat(oy_pk), scat(ox_pk)
        ro_s = scat(row_off)
        oy_eff = jnp.where(efft % 2 == 1, oy_pk_s >> 16, oy_pk_s & 0xFFFF)
        ox_eff = jnp.where(efft // 2 == 1, ox_pk_s >> 16, ox_pk_s & 0xFFFF)
        hw_s = scat(hw_pk)
        wy = _pooled_axis_weights_host(
            scat(prep["y0"]), scat(prep["bin_h"]), oy_eff - ro_s,
            (hw_s & 0xFFFF).astype(jnp.float32), s, r, WIN_Y)
        wx = _pooled_axis_weights_host(
            scat(prep["x0"]), scat(prep["bin_w"]), ox_eff,
            (hw_s >> 16).astype(jnp.float32), s, r, WIN)
        # matmul1 runs in the window dtype; precompute wy there to halve
        # its stream bytes. wx stays f32 (matmul2's lhs).
        wy_blk = _block_diag_weights(wy, gsz, features[0].dtype)
        wx_blk = _block_diag_weights(wx, gsz, jnp.float32)
        arrays = (gtier_eff, oy_pk_s, ox_pk_s,
                  scat(batch_idx.astype(jnp.int32)))
        pooled = _ml_call(atlas, arrays, s, r, gsz, r_cap, out_dtype,
                          prew=(wy_blk, wx_blk))
    else:
        arrays = (gtier, scat(oy_pk), scat(ox_pk),
                  scat(batch_idx.astype(jnp.int32)), scat(row_off),
                  scat(hw_pk), scat(prep["y0"]), scat(prep["x0"]),
                  scat(prep["bin_h"]), scat(prep["bin_w"]))
        pooled = _ml_call(atlas, arrays, s, r, gsz, r_cap, out_dtype)
    # unsort: original ROI order[j] sits at kernel slot pos[j]
    inv_pos = jnp.zeros((n_roi,), jnp.int32).at[order].set(pos)
    return pooled[inv_pos]


# ---------------------------------------------------------------------------
# Differentiable training pooler: Pallas forward + hand-derived backward.
#
# ROIAlign is LINEAR in the features for fixed boxes:
#     out[q, n1, n2, c] = sum_{i,j} wy[q,n1,i] * wx[q,n2,j] * win_q[i,j,c]
# so the VJP w.r.t. features needs no forward residuals — it is the exact
# transpose: per ROI, two small matmuls build the window cotangent
#     gwin_q[i,j,c] = sum_{n1,n2} wy[q,n1,i] * wx[q,n2,j] * g[q,n1,n2,c]
# followed by one scatter-add of the windows into the (padded, flattened)
# feature pyramid. Chunked over ROIs with lax.scan to bound live memory.
# Counterpart of the reference's ROIAlign_backward CUDA kernel
# (detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu), re-derived for the
# window/separable formulation above.
# ---------------------------------------------------------------------------

_BWD_CHUNK = 32  # ROIs per scan step in the backward (bounds gwin memory)


def _rel_coords(s: int, r: int) -> jnp.ndarray:
    """(s*r,) sample offsets in bin units: bin index + centered subsample."""
    idx = jnp.arange(s * r, dtype=jnp.int32)
    return (idx // r).astype(jnp.float32) + ((idx % r).astype(jnp.float32) + 0.5) / r


def _axis_weights_batch(coords, size, origin, win):
    """Batched replica of the kernel's axis_weights: (R, n) -> (R, n, win)."""
    inside = (coords >= -1.0) & (coords <= size[:, None])
    cc = jnp.clip(coords, 0.0, size[:, None] - 1.0)
    local = jnp.clip(cc - origin[:, None].astype(jnp.float32), 0.0, win - 1.0)
    cells = jnp.arange(win, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, :, None] - cells))
    return wgt * inside[:, :, None]


def _ml_geometry(boxes, batch_idx, dims, strides, s, r, cbs, cl):
    """Per-ROI separable weights + flat window indices into the padded,
    flattened pyramid. Shared by the reference forward and the backward."""
    prep = _ml_prep(boxes, dims, strides, s, r, cbs, cl)
    lvl, oy, ox = prep["lvl"], prep["oy"], prep["ox"]
    pdims = prep["pdims"]
    n = s * r

    true_h = jnp.asarray([d[0] for d in dims], jnp.float32)[lvl]
    true_w = jnp.asarray([d[1] for d in dims], jnp.float32)[lvl]
    rel = _rel_coords(s, r)
    ys = prep["y0"][:, None] + rel[None, :] * prep["bin_h"][:, None]
    xs = prep["x0"][:, None] + rel[None, :] * prep["bin_w"][:, None]
    wy = _axis_weights_batch(ys, true_h, oy, WIN_Y)   # (R, n, WIN_Y)
    wx = _axis_weights_batch(xs, true_w, ox, WIN)     # (R, n, WIN)

    sizes = np.array([ph * pw for ph, pw in pdims], np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    total = int(offsets[-1])
    pw_r = jnp.asarray([d[1] for d in pdims], jnp.int32)[lvl]
    base = batch_idx.astype(jnp.int32) * total + jnp.asarray(offsets[:-1])[lvl]
    ii_y = jnp.arange(WIN_Y, dtype=jnp.int32)
    ii_x = jnp.arange(WIN, dtype=jnp.int32)
    rows = (oy[:, None] + ii_y) * pw_r[:, None]                  # (R, WIN_Y)
    cols = ox[:, None] + ii_x                                    # (R, WIN)
    idx = base[:, None, None] + rows[:, :, None] + cols[:, None, :]
    return wy, wx, idx, prep, total


def _pad_pyramid_flat(features, pdims):
    """Concatenate zero-padded levels into one (B*total, C) buffer."""
    b = features[0].shape[0]
    c = features[0].shape[-1]
    flat = []
    for f, (ph, pw) in zip(features, pdims):
        dh, dw = ph - f.shape[1], pw - f.shape[2]
        if dh or dw:
            f = jnp.pad(f, ((0, 0), (0, dh), (0, dw), (0, 0)))
        flat.append(f.reshape(b, -1, c))
    return jnp.concatenate(flat, axis=1).reshape(-1, c)


def multilevel_roi_align_ref(
    features, boxes, batch_idx, output_size, strides,
    sampling_ratio: int = 2, canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Pure-JAX replica of the Pallas kernel's exact math (window gather +
    separable matmuls). Used to validate the kernel and its hand-written
    VJP; differentiable by autodiff."""
    if sampling_ratio <= 0:
        sampling_ratio = 2
    s, r = output_size, sampling_ratio
    features, strides = _append_virtual_level(features, tuple(strides))
    dims = tuple((f.shape[1], f.shape[2]) for f in features)
    wy, wx, idx, prep, _ = _ml_geometry(
        boxes, batch_idx, dims, tuple(strides), s, r,
        canonical_box_size, canonical_level,
    )
    flat = _pad_pyramid_flat(features, prep["pdims"]).astype(jnp.float32)
    win = flat[idx]                                    # (R, WIN_Y, WIN, C)
    out = jnp.einsum("rni,rijc->rnjc", wy, win)
    out = jnp.einsum("rmj,rnjc->rnmc", wx, out)
    n_roi, c = boxes.shape[0], features[0].shape[-1]
    out = out.reshape(n_roi, s, r, s, r, c)
    return jnp.mean(out, axis=(2, 4))


def _ml_bwd_features(g, boxes, batch_idx, shapes, dtype, output_size,
                     strides, sampling_ratio, cbs, cl):
    """Exact transpose of the window/separable forward w.r.t. features."""
    s, r = output_size, sampling_ratio
    n = s * r
    dims = tuple((sh[1], sh[2]) for sh in shapes)
    b, c = shapes[0][0], shapes[0][-1]
    wy, wx, idx, prep, total = _ml_geometry(
        boxes, batch_idx, dims, strides, s, r, cbs, cl,
    )
    n_roi = boxes.shape[0]
    # cotangent at the sample grid: pooling was a mean over r*r samples
    g = g.astype(jnp.float32)
    gs = jnp.repeat(jnp.repeat(g, r, axis=1), r, axis=2) / float(r * r)

    k = _BWD_CHUNK
    r_pad = ((n_roi + k - 1) // k) * k
    pad = r_pad - n_roi

    def padr(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    wy_c = padr(wy).reshape(-1, k, n, WIN_Y)
    wx_c = padr(wx).reshape(-1, k, n, WIN)
    gs_c = padr(gs).reshape(-1, k, n, n, c)     # zero pad => zero contribution
    idx_c = padr(idx).reshape(-1, k, WIN_Y, WIN)

    def body(df, args):
        wyk, wxk, gsk, idxk = args
        tmp = jnp.einsum("kni,knmc->kimc", wyk, gsk)
        gwin = jnp.einsum("kmj,kimc->kijc", wxk, tmp)   # (k, WIN_Y, WIN, C)
        df = df.at[idxk.reshape(-1)].add(gwin.reshape(-1, c))
        return df, None

    df = jnp.zeros((b * total, c), jnp.float32)
    df, _ = jax.lax.scan(body, df, (wy_c, wx_c, gs_c, idx_c))

    # unflatten the padded pyramid, crop to true dims, restore dtype
    grads = []
    off = 0
    for (h, w), (ph, pw) in zip(dims, prep["pdims"]):
        seg = df.reshape(b, total, c)[:, off:off + ph * pw]
        grads.append(seg.reshape(b, ph, pw, c)[:, :h, :w].astype(dtype))
        off += ph * pw
    return grads




# ---------------------------------------------------------------------------
# Pallas backward: serial read-modify-write window accumulation.
#
# The XLA formulation above (chunked scatter-add) lowers to sort-based
# scatters: ~30-40 ms per 1024-ROI pool on v5e — slower than the rest of
# the backward combined. This kernel exploits the TPU grid's sequential
# execution: per ROI it computes the window cotangent with the transposed
# separable matmuls (gwin = wyP^T g wxP, pooled weights folded exactly as
# in the forward) and accumulates it into the padded gradient pyramid via
# an HBM read-add-write of the same window the forward DMA'd. In-step
# write waits keep overlapping windows of consecutive ROIs race-free.
# ---------------------------------------------------------------------------


def _ml_bwd_kernel(
    oy_ref, ox_ref, batch_ref, lvl_ref, y0_ref, x0_ref, binh_ref, binw_ref,
    tier_ref, oys_ref, oxs_ref,
    *refs,
    s: int,
    r: int,
    num_levels: int,
    level_dims: tuple,
):
    # refs: L aliased grad-input refs (ignored), gs input block,
    #       L grad-output refs, win scratch, read/write semaphores
    gs_ref = refs[num_levels]                     # (1, s, s, C) VMEM block
    out_refs = refs[num_levels + 1: 2 * num_levels + 1]
    win_scr = refs[2 * num_levels + 1]            # (WIN_Y, WIN, C) f32
    rsem = refs[2 * num_levels + 2]
    wsem = refs[2 * num_levels + 3]

    roi = pl.program_id(0)
    b = batch_ref[roi]
    lvl = lvl_ref[roi]
    tc = tier_ref[roi]

    n = s * r
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    offs = (idx_i // r).astype(jnp.float32)
    sub = ((idx_i % r).astype(jnp.float32) + 0.5) / r
    rel = (offs + sub)[:, 0]

    def axis_weights_pooled(coords, size, origin, win):
        inside = (coords >= -1.0) & (coords <= size)
        cc = jnp.clip(coords, 0.0, size - 1.0)
        local = jnp.clip(cc - origin.astype(jnp.float32), 0.0, win - 1.0)
        cells = jax.lax.broadcasted_iota(jnp.int32, (n, win), 1).astype(
            jnp.float32
        )
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, None] - cells))
        wgt = wgt * inside[:, None]
        return wgt.reshape(s, r, win).sum(axis=1) * (1.0 / r)

    h = jnp.float32(level_dims[0][0])
    w = jnp.float32(level_dims[0][1])
    for k in range(1, num_levels):
        h = jnp.where(lvl == k, jnp.float32(level_dims[k][0]), h)
        w = jnp.where(lvl == k, jnp.float32(level_dims[k][1]), w)
    ys = y0_ref[roi] + rel * binh_ref[roi]
    xs = x0_ref[roi] + rel * binw_ref[roi]

    gs = gs_ref[0].astype(jnp.float32)             # (s, s, C)
    c = gs.shape[-1]

    # tier-predicated window extents (same per-axis small-window tiers as
    # the forward, _TIER_DIMS): a small ROI's cotangent window is (16, 24)
    # instead of (32, 40) — 4x less read-add-write traffic on the serial
    # RMW chain that bounds this kernel. Origins per axis come from the
    # matching prep (full- vs small-window clamp), exactly as the forward's
    # eff_origins.
    for t, (wy_e, wx_e) in enumerate(_TIER_DIMS):
        @pl.when(tc == t)
        def _(t=t, wy_e=wy_e, wx_e=wx_e):
            oy_t = oys_ref[roi] if (t & 1) else oy_ref[roi]
            ox_t = pl.multiple_of(
                oxs_ref[roi] if (t & 2) else ox_ref[roi], 8)
            wy = axis_weights_pooled(ys, h, oy_t, wy_e)    # (s, wy_e)
            wx = axis_weights_pooled(xs, w, ox_t, wx_e)    # (s, wx_e)
            # gwin[i, j, ch] = sum_{n1,n2} wy[n1,i] wx[n2,j] gs[n1,n2,ch]
            tmp = jax.lax.dot_general(
                wy, gs.reshape(s, s * c),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(wy_e, s, c)                          # (wy_e, n2, C)
            gwin = jax.lax.dot_general(
                tmp, wx,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).transpose(0, 2, 1)                           # (wy_e, wx_e, C)

            # read-modify-write the ROI's window; the in-step write wait
            # orders it before the (possibly overlapping) read of the next
            # grid step
            scr = win_scr.at[:wy_e, :wx_e]
            for k in range(num_levels):
                @pl.when(lvl == k)
                def _(k=k):
                    rd = pltpu.make_async_copy(
                        out_refs[k].at[
                            b, pl.ds(oy_t, wy_e), pl.ds(ox_t, wx_e), :],
                        scr, rsem,
                    )
                    rd.start()
                    rd.wait()
                    scr[:] = scr[:] + gwin
                    wr = pltpu.make_async_copy(
                        scr,
                        out_refs[k].at[
                            b, pl.ds(oy_t, wy_e), pl.ds(ox_t, wx_e), :],
                        wsem,
                    )
                    wr.start()
                    wr.wait()


def _ml_bwd_features_pallas(g, boxes, batch_idx, shapes, dtype, output_size,
                            strides, sampling_ratio, cbs, cl):
    """Pallas RMW backward; returns per-level grads with true dims."""
    s, r = output_size, sampling_ratio
    dims = tuple((sh[1], sh[2]) for sh in shapes)
    b, c = shapes[0][0], shapes[0][-1]
    n_roi = boxes.shape[0]
    num_levels = len(dims)

    prep = _ml_prep(boxes, dims, tuple(strides), s, r, cbs, cl)
    # small-window origins + per-ROI tier code, same rule as the forward
    prep_s = _ml_prep(boxes, dims, tuple(strides), s, r, cbs, cl,
                      win_y=WIN_S_Y, win_x=WIN_S_X)
    small_y = prep["bin_h"] * s <= WIN_S_Y - 4
    small_x = prep["bin_w"] * s <= WIN_S_X - 11
    if os.environ.get("U2SEG_POOL_FORCE_FULL_WINDOW"):
        small_y = jnp.zeros_like(small_y)
        small_x = jnp.zeros_like(small_x)
    tier = small_y.astype(jnp.int32) + 2 * small_x.astype(jnp.int32)
    pdims = prep["pdims"]
    zeros = [jnp.zeros((b, ph, pw, c), jnp.float32) for ph, pw in pdims]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(n_roi,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_levels + [
            pl.BlockSpec((1, s, s, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_levels,
        scratch_shapes=[
            pltpu.VMEM((WIN_Y, WIN, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _ml_bwd_kernel, s=s, r=r, num_levels=num_levels,
        level_dims=tuple((int(d[0]), int(d[1])) for d in dims),
    )
    grads = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, ph, pw, c), jnp.float32)
                   for ph, pw in pdims],
        grid_spec=grid_spec,
        # aliased zero-initialized accumulators (operand indices count the
        # 11 scalar-prefetch args first)
        input_output_aliases={11 + i: i for i in range(num_levels)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        prep["oy"], prep["ox"], batch_idx.astype(jnp.int32), prep["lvl"],
        prep["y0"], prep["x0"], prep["bin_h"], prep["bin_w"],
        tier, prep_s["oy"], prep_s["ox"],
        *zeros, g.astype(jnp.float32),
    )
    return [
        grad[:, :hw[0], :hw[1]].astype(dtype)
        for grad, hw in zip(grads, dims)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _train_pooler(features, boxes, batch_idx, output_size, strides,
                  sampling_ratio, cbs, cl, shapes, dtype):
    # features/strides/shapes are EXTENDED (virtual level appended by
    # multilevel_roi_align_train, outside this custom_vjp, so autodiff
    # chains the virtual-level cotangent back through the average pool)
    return _ml_pallas_ext(
        features, boxes, batch_idx, output_size, strides,
        sampling_ratio=sampling_ratio, canonical_box_size=cbs,
        canonical_level=cl,
    )


def _train_pooler_fwd(features, boxes, batch_idx, output_size, strides,
                      sampling_ratio, cbs, cl, shapes, dtype):
    out = _train_pooler(features, boxes, batch_idx, output_size, strides,
                        sampling_ratio, cbs, cl, shapes, dtype)
    return out, (boxes, batch_idx)


def _train_pooler_bwd(output_size, strides, sampling_ratio, cbs, cl,
                      shapes, dtype, res, g):
    boxes, batch_idx = res
    dfeat = _ml_bwd_features_pallas(
        g, boxes, batch_idx, shapes, dtype, output_size, strides,
        sampling_ratio, cbs, cl,
    )
    dboxes = jnp.zeros_like(boxes)   # boxes are non-differentiable (ref: proposals detached)
    dbidx = np.zeros(batch_idx.shape, jax.dtypes.float0)
    return (dfeat, dboxes, dbidx)


_train_pooler.defvjp(_train_pooler_fwd, _train_pooler_bwd)


def multilevel_roi_align_train(
    features, boxes, batch_idx, output_size, strides,
    sampling_ratio: int = 2, canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """Differentiable Pallas pooler for training: kernel forward, exact
    hand-derived transpose backward (no forward residuals needed — the map
    is linear in the features for fixed boxes)."""
    if sampling_ratio <= 0:
        sampling_ratio = 2
    features, strides = _append_virtual_level(features, tuple(strides))
    shapes = tuple(tuple(f.shape) for f in features)
    return _train_pooler(
        list(features), boxes, batch_idx, output_size, strides,
        sampling_ratio, canonical_box_size, canonical_level,
        shapes, features[0].dtype,
    )
