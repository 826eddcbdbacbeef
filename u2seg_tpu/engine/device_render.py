"""On-device exact full-resolution panoptic render with RLE-packed fetch.

TPU-first replacement for the host render pipeline
(``engine/panoptic_render.py``) on the dataset-evaluation path. The
reference performs mask paste / semantic upsample / panoptic fusion on the
host per image (``detectron2/layers/mask_ops.py:74``,
``modeling/postprocessing.py:77``, ``meta_arch/panoptic_fpn.py:184-269``);
shipping the 28-channel stride-4 semantic logits (7.5 MB/img f32) and
100x28x28 mask logits to the host dominates end-to-end time whenever the
host link is the bottleneck. Here the full chain runs on device at the
original image resolution inside the same jit as the model forward, and the
host fetches only:

  - run-length-encoded panoptic id map and semantic argmax map
    (~100-200 KB/img instead of ~8 MB/img),
  - small per-segment tables (who was painted, scores, classes, areas).

Exactness: the math mirrors ``panoptic_render.py`` — the two-stage bilinear
semantic chain (head 4x upsample then crop + resize to the original
resolution, ``semantic_seg.py:231`` + ``postprocessing.py:77``) is composed
into per-axis 4-tap weight matrices evaluated as f32 matmuls on the MXU;
mask paste uses the separable-matmul ``ops/mask_paste.py`` at HIGHEST
precision; fusion reuses the fixpoint greedy of
``models/panoptic_fpn.combine_semantic_and_instance`` with the reference's
*sequential compacted* segment ids (instances in paint order, then stuff
in ascending label order). Differences vs the float64 host oracle are
confined to sub-ulp ties (argmax / 0.5-threshold pixels); see
``tests/engine/test_device_render.py``.

Static shapes: the render canvas (``cfg.test.render_canvas``) bounds the
original resolution; the per-image (oh, ow) enters only through traced
scalars (gather positions / masks), so one compile covers every original
size that fits the canvas. Images that do not fit — or whose RLE exceeds
``max_runs``, or that have more eligible instances than ``k_fuse`` — raise
a per-image fallback flag and the host renders those exactly
(``panoptic_render.render_panoptic_output``).
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from u2seg_tpu.ops.mask_paste import paste_masks


# ---------------------------------------------------------------------------
# Device-side pieces
# ---------------------------------------------------------------------------

def _clamped_axis_weights(coord: jnp.ndarray, src_size: int) -> jnp.ndarray:
    """(P,) float sample coords -> (P, src_size) 2-tap bilinear weights with
    border-replicate clamping (cv2.resize INTER_LINEAR float semantics:
    src = (dst+0.5)*scale - 0.5, taps clamped into [0, ssize-1])."""
    j = jnp.arange(src_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[:, None] - j[None, :]))


def sem_resize_weights(
    out_size: int,        # static canvas extent along this axis
    s4_size: int,         # static stride-4 logits extent
    stride: int,
    in_valid: jnp.ndarray,    # () traced: valid input extent (ih or iw)
    out_valid: jnp.ndarray,   # () traced: original extent (oh or ow)
) -> jnp.ndarray:
    """Composed per-axis weights (out_size, s4_size) of the exact two-stage
    bilinear chain: stride-s upsample of the s4 logits (border replicate),
    crop to ``in_valid``, resize to ``out_valid``.

    Both stages are linear along the axis, so the composition is a single
    (out, s4) matrix: W = B @ A with A the static 4x-upsample weights and B
    the dynamic crop+resize weights. Rows >= out_valid are garbage and must
    be masked by the caller's valid-region mask.
    """
    up = s4_size * stride
    # stage A (static): y-th upsampled row samples s4 at (y+0.5)/stride - 0.5
    ca = jnp.clip(
        (jnp.arange(up, dtype=jnp.float32) + 0.5) / stride - 0.5,
        0.0, s4_size - 1.0,
    )
    a = _clamped_axis_weights(ca, s4_size)                    # (up, s4)
    # stage B (dynamic): i-th output row samples the cropped upsampled field
    # at (i+0.5) * in_valid/out_valid - 0.5, clamped to the crop border
    scale = in_valid.astype(jnp.float32) / jnp.maximum(
        out_valid.astype(jnp.float32), 1.0
    )
    cb = jnp.clip(
        (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5,
        0.0, jnp.maximum(in_valid.astype(jnp.float32) - 1.0, 0.0),
    )
    b = _clamped_axis_weights(cb, up)                         # (out, up)
    return jax.lax.dot(
        b, a, precision=jax.lax.Precision.HIGHEST
    )                                                          # (out, s4)


def resize_image_device(
    raw: jnp.ndarray,            # (RH, RW, 3) u8/f32 raw image, zero-padded
    orig_hw: jnp.ndarray,        # (2,) int32 valid raw extent
    input_hw: jnp.ndarray,       # (2,) int32 resize target (<= canvas)
    canvas: Tuple[int, int],     # static network-input bucket (BH, BW)
) -> jnp.ndarray:
    """Test-time resize on device (ResizeShortestEdge semantics): bilinear
    with half-pixel centers and border replicate — the float-path
    cv2.resize(INTER_LINEAR) formula, evaluated as two weight matmuls on
    the MXU. The host oracle is ``ResizeTransform.apply_image`` on a
    float32 image (predictor._prepare); uploading the RAW uint8 image and
    resizing here cuts the host->device bytes ~3.5x vs the resized u8
    image and ~14x vs resized f32.

    Rows/cols beyond ``input_hw`` are zeroed (the model masks by
    image_sizes anyway).
    """
    bh, bw = canvas
    rh, rw = raw.shape[0], raw.shape[1]
    oh, ow = orig_hw[0], orig_hw[1]
    ih, iw = input_hw[0], input_hw[1]

    def axis_w(out_size, src_size, src_valid, dst_valid):
        scale = src_valid.astype(jnp.float32) / jnp.maximum(
            dst_valid.astype(jnp.float32), 1.0)
        coord = jnp.clip(
            (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5,
            0.0, jnp.maximum(src_valid.astype(jnp.float32) - 1.0, 0.0),
        )
        return _clamped_axis_weights(coord, src_size)

    wy = axis_w(bh, rh, oh, ih)                           # (BH, RH)
    wx = axis_w(bw, rw, ow, iw)                           # (BW, RW)
    out = jnp.einsum(
        "ip,pqc,jq->ijc", wy, raw.astype(jnp.float32), wx,
        precision=jax.lax.Precision.HIGHEST, optimize=True,
    )
    inside = (jnp.arange(bh)[:, None] < ih) & (jnp.arange(bw)[None, :] < iw)
    return jnp.where(inside[..., None], out, 0.0)


def rle_encode(flat: jnp.ndarray, max_runs: int):
    """Run-length encode a flat int array with a static run budget.

    Returns (starts (max_runs,) int32, values int32, n_runs int32). Runs
    beyond the budget are dropped (caller checks ``n_runs <= max_runs`` and
    falls back). Decoding: run r covers [starts[r], starts[r+1]) with value
    values[r]; the last run ends at ``flat.size``.
    """
    n = flat.shape[0]
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])        # (n,)
    rank = jnp.cumsum(boundary.astype(jnp.int32)) - 1         # 0-based run id
    n_runs = rank[-1] + 1
    # SCATTER-FREE compaction: stream compaction as a key sort. Boundary
    # positions keep their run id as the key, everything else keys to n;
    # a stable sort_key_val against the position iota then yields the run
    # start positions as the first n_runs entries, already in run order.
    # XLA's TPU sort is fully vectorized (~0.96 ms per 410k map on v5e);
    # the scatter-max formulation this replaces carries duplicate indices,
    # which XLA lowers to the SERIAL scalar core (~6.9 ms per map) whenever
    # the input is a computed value rather than a parameter.
    key = jnp.where(boundary, rank, n).astype(jnp.int32)
    _, starts_full = jax.lax.sort_key_val(
        key, jnp.arange(n, dtype=jnp.int32))
    starts = starts_full[:max_runs]
    if n < max_runs:  # tiny maps (tests): budget exceeds the pixel count
        starts = jnp.pad(starts, (0, max_runs - n))
    ok = jnp.arange(max_runs) < jnp.minimum(n_runs, max_runs)
    starts = jnp.where(ok, starts, 0)
    values = jnp.where(ok, flat[starts].astype(jnp.int32), 0)
    return starts, values, n_runs


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderedImage:
    """Compact device render of one image (all shapes static)."""
    pan_starts: jnp.ndarray       # (R,) int32
    pan_values: jnp.ndarray       # (R,) int32
    pan_nruns: jnp.ndarray        # () int32
    sem_starts: jnp.ndarray       # (R,) int32
    sem_values: jnp.ndarray       # (R,) int32
    sem_nruns: jnp.ndarray        # () int32
    takes: jnp.ndarray            # (Kf,) bool  — painted, in sorted order
    order: jnp.ndarray            # (Kf,) int32 — det slot per sorted rank
    sorted_scores: jnp.ndarray    # (Kf,)
    sorted_classes: jnp.ndarray   # (Kf,) int32
    stuff_ok: jnp.ndarray         # (C,) bool
    stuff_area: jnp.ndarray       # (C,) int32
    fallback: jnp.ndarray         # () bool — host must re-render exactly


def _render_maps(
    boxes: jnp.ndarray,           # (K, 4) XYXY network-input coords
    scores: jnp.ndarray,          # (K,)
    classes: jnp.ndarray,         # (K,) int32
    valid: jnp.ndarray,           # (K,) bool
    mask_logits: jnp.ndarray,     # (K, M, M)
    sem_logits: jnp.ndarray,      # (H4, W4, C) stride-4, padded
    input_hw: jnp.ndarray,        # (2,) int32 valid network-input size
    orig_hw: jnp.ndarray,         # (2,) int32 original size
    *,
    canvas: Tuple[int, int],
    k_fuse: int,
    stride: int = 4,
    instance_conf_thresh: float = 0.5,
    overlap_thresh: float = 0.5,
    stuff_area_limit: int = 4096,
):
    """Exact full-res render of one image on device (see module docstring):
    (pan (OH, OW) i32, sem_lab (OH, OW) i32, per-segment meta dict)."""
    oh_c, ow_c = canvas
    h4, w4, num_stuff = sem_logits.shape
    k = boxes.shape[0]
    k_fuse = min(k_fuse, k)
    ih, iw = input_hw[0], input_hw[1]
    oh, ow = orig_hw[0], orig_hw[1]

    yy = jnp.arange(oh_c, dtype=jnp.int32)[:, None]
    xx = jnp.arange(ow_c, dtype=jnp.int32)[None, :]
    inside = (yy < oh) & (xx < ow)                            # (OH, OW)

    # ---- semantic: composed two-stage bilinear + argmax -----------------
    # Evaluated as two plain 2D matmuls (x then y) with the class axis
    # folded into the M dimension — the c=28 axis is far below the 128-lane
    # MXU tile, so batching it as an einsum minor dim wastes ~5x; as part
    # of M both contractions run at full tile occupancy.
    wy = sem_resize_weights(oh_c, h4, stride, ih, oh)         # (OH, H4)
    wx = sem_resize_weights(ow_c, w4, stride, iw, ow)         # (OW, W4)
    s_pc_q = sem_logits.astype(jnp.float32).transpose(0, 2, 1)  # (H4, C, W4)
    t = jax.lax.dot(
        s_pc_q.reshape(h4 * num_stuff, w4), wx.T,
        precision=jax.lax.Precision.HIGHEST,
    )                                                          # (H4*C, OW)
    sem_full = jax.lax.dot(
        wy, t.reshape(h4, num_stuff * ow_c),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(oh_c, num_stuff, ow_c)                           # (OH, C, OW)
    sem_lab = jnp.where(
        inside, jnp.argmax(sem_full, axis=1).astype(jnp.int32), 0
    )

    # ---- instances: sort, truncate to the fusion budget ------------------
    ordr = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))   # stable
    ordr = ordr[:k_fuse].astype(jnp.int32)
    sscores = scores[ordr]
    sclasses = classes[ordr].astype(jnp.int32)
    svalid = valid[ordr]

    # boxes -> original-resolution coords (detector_postprocess,
    # ref modeling/postprocessing.py:9)
    sb = boxes[ordr].astype(jnp.float32)
    sx = ow.astype(jnp.float32) / iw.astype(jnp.float32)
    sy = oh.astype(jnp.float32) / ih.astype(jnp.float32)
    sb = sb * jnp.array([1, 0, 1, 0], jnp.float32) * sx + \
         sb * jnp.array([0, 1, 0, 1], jnp.float32) * sy
    sb = jnp.clip(
        sb,
        0.0,
        jnp.stack([ow, oh, ow, oh]).astype(jnp.float32)[None, :],
    )

    masks_full = paste_masks(
        jax.nn.sigmoid(mask_logits[ordr].astype(jnp.float32)), sb,
        oh_c, ow_c, precision=jax.lax.Precision.HIGHEST,
    ) >= 0.5
    masks_full = masks_full & inside[None]

    area = jnp.sum(masks_full, axis=(1, 2))                   # (Kf,)
    eligible = svalid & (sscores >= instance_conf_thresh) & (area > 0)

    # greedy paint in score order (ref panoptic_fpn.py:219-245): instance i
    # is painted iff its overlap with the union of earlier-painted masks is
    # <= overlap_thresh. A sequential scan carrying only the claimed bitmap
    # touches ~1 MB/step; the fixpoint formulation this replaces re-read the
    # full (Kf, OH, OW) stack every iteration (~5 ms/img at the bench shape).
    def paint_step(claimed, xs):
        mask, elig, ar = xs
        inter = jnp.sum(mask & claimed)
        take = elig & (inter / jnp.maximum(ar, 1) <= overlap_thresh)
        return claimed | (mask & take), take

    claimed, takes = jax.lax.scan(
        paint_step, jnp.zeros((oh_c, ow_c), bool),
        (masks_full, eligible, area),
    )
    # first-taken-wins winner + sequential paint-order ids (ref
    # panoptic_fpn.py:232-245) in ONE fused pass over the mask stack:
    # ``seq`` is nondecreasing, so the first (min-index) taking mask's id
    # equals the min of ``seq`` over taking masks at that pixel. The
    # previous two-step form (argmin winner map, then ``seq[wm]``) lowered
    # the (OH, OW)-indexed table gather to the serial scalar core —
    # ~26 ms/batch at k_fuse=100, the single hottest op of the render.
    seq = jnp.cumsum(takes.astype(jnp.int32))                 # (Kf,) 1-based
    n_inst = seq[-1] if k_fuse else jnp.int32(0)
    inst_id_map = jnp.where(
        claimed,
        jnp.min(jnp.where(masks_full & takes[:, None, None],
                          seq[:, None, None], jnp.int32(k_fuse + 1)),
                axis=0),
        0,
    ).astype(jnp.int32)

    # ---- stuff fill (ref panoptic_fpn.py:246-266) ------------------------
    stuff_mask = (~claimed) & (sem_lab > 0) & inside
    # per-class areas via one (1, HW) @ (HW, C) matmul on exact 0/1 values
    # (counts < 2^24 so the f32 accumulation is exact); the dense one_hot
    # int32 tensor this replaces cost ~90 MB of HBM traffic per image
    onehot_bf = (
        sem_lab[..., None] == jnp.arange(num_stuff, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    stuff_area = jax.lax.dot(
        stuff_mask.reshape(1, -1).astype(jnp.bfloat16),
        onehot_bf.reshape(-1, num_stuff),
        preferred_element_type=jnp.float32,
    )[0].astype(jnp.int32)                                    # (C,)
    stuff_ok = (stuff_area >= stuff_area_limit) & (
        jnp.arange(num_stuff) > 0
    )
    # sequential stuff ids after the instances, ascending label order
    stuff_rank = jnp.cumsum(stuff_ok.astype(jnp.int32))       # (C,) 1-based
    stuff_id = n_inst + stuff_rank                            # (C,)
    # per-pixel table lookups stuff_ok[sem_lab] / stuff_id[sem_lab] as one
    # (HW, C) @ (C, 2) matmul on the exact 0/1 one-hot already built for
    # the area sum (ids <= k_fuse + C = 128, exact in bf16; a direct
    # (OH, OW)-indexed gather lowers to the serial scalar core like the
    # instance-id gather above)
    tab = jnp.stack([
        jnp.where(stuff_ok, stuff_id, 0).astype(jnp.bfloat16),
        stuff_ok.astype(jnp.bfloat16),
    ], axis=1)                                                # (C, 2)
    looked = jax.lax.dot(
        onehot_bf.reshape(-1, num_stuff), tab,
        preferred_element_type=jnp.float32,
    ).reshape(oh_c, ow_c, 2)
    lab_ok = (looked[..., 1] > 0.5) & stuff_mask
    stuff_id_map = jnp.where(
        lab_ok, looked[..., 0].astype(jnp.int32), 0)

    pan = jnp.where(inside, inst_id_map + stuff_id_map, 0)

    n_eligible_all = jnp.sum(
        valid & (scores >= instance_conf_thresh)
    )
    fallback = (oh > oh_c) | (ow > ow_c) | (n_eligible_all > k_fuse)
    return pan, sem_lab, dict(
        takes=takes, order=ordr, sorted_scores=sscores,
        sorted_classes=sclasses, stuff_ok=stuff_ok, stuff_area=stuff_area,
        fallback=fallback,
    )


def _encode_rendered(pan, sem_lab, meta, max_runs: int) -> RenderedImage:
    """RLE-encode the rendered maps and assemble the fetch struct."""
    pan_s, pan_v, pan_n = rle_encode(pan.reshape(-1), max_runs)
    sem_s, sem_v, sem_n = rle_encode(sem_lab.reshape(-1), max_runs)
    fallback = meta["fallback"] | (pan_n > max_runs) | (sem_n > max_runs)
    return RenderedImage(
        pan_starts=pan_s, pan_values=pan_v, pan_nruns=pan_n,
        sem_starts=sem_s, sem_values=sem_v, sem_nruns=sem_n,
        takes=meta["takes"], order=meta["order"],
        sorted_scores=meta["sorted_scores"],
        sorted_classes=meta["sorted_classes"], stuff_ok=meta["stuff_ok"],
        stuff_area=meta["stuff_area"], fallback=fallback,
    )


def render_image(*args, max_runs: int, **kw) -> RenderedImage:
    """Exact full-res render + RLE pack of one image (see _render_maps)."""
    pan, sem_lab, meta = _render_maps(*args, **kw)
    return _encode_rendered(pan, sem_lab, meta, max_runs)


def render_batch(
    det,                          # Detections pytree, batched (B, ...)
    sem_logits: jnp.ndarray,      # (B, H4, W4, C)
    image_sizes: jnp.ndarray,     # (B, 2)
    orig_sizes: jnp.ndarray,      # (B, 2)
    max_runs: int = 16384,
    **kw,
) -> RenderedImage:
    """Sequentially-mapped batch render (lax.map bounds peak HBM: the
    per-image paste/fusion canvases are ~0.5 GB each at a 640^2 canvas).

    The RLE encode runs OUTSIDE the per-image map, vmapped over the batch:
    embedded in the big map body, XLA assigns the run scatters to scalar
    memory and the serial scalar core (~3.5 ms each); as a standalone
    batched stage they take the vectorized emitter (~10 us each)."""
    def one(args):
        b, s, c, v, m, sl, hw, ohw = args
        return _render_maps(b, s, c, v, m, sl, hw, ohw, **kw)

    pan, sem_lab, meta = jax.lax.map(one, (
        det.boxes, det.scores, det.classes, det.valid, det.mask_logits,
        sem_logits, image_sizes, orig_sizes,
    ))
    return jax.vmap(
        lambda p, s, m: _encode_rendered(p, s, m, max_runs)
    )(pan, sem_lab, meta)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedRender:
    """Batch render with the RLE buffers compacted for prefix fetch.

    ``render_batch`` returns fixed (B, max_runs) run buffers; fetching them
    whole moves ~256 KB/img of zero padding over the host link for typical
    images that use a few percent of the budget. Here the batch's used runs
    are scattered into ONE shared buffer (pan then sem, per image, in batch
    order) so the host can read ``offs`` (tiny) and then transfer only
    ``starts[:offs[-1]]`` / ``values[:offs[-1]]`` — run values fit int16
    (segment ids are bounded by k_fuse + num_stuff << 32768).
    """
    starts: jnp.ndarray           # (2*B*R,) int32 run starts, compacted
    values: jnp.ndarray           # (2*B*R,) int16 run values, compacted
    offs: jnp.ndarray             # (2B+1,) int32: image b's pan runs live at
                                  # [offs[2b], offs[2b+1]), sem at
                                  # [offs[2b+1], offs[2b+2])
    starts_prefix: jnp.ndarray    # (P,) static prefix of ``starts`` — fetched
                                  # unconditionally so the common case costs
                                  # NO extra device program mid-pipeline
    values_prefix: jnp.ndarray    # (P,) int16 prefix of ``values``
    takes: jnp.ndarray            # (B, Kf) bool
    order: jnp.ndarray            # (B, Kf) int32
    sorted_scores: jnp.ndarray    # (B, Kf)
    sorted_classes: jnp.ndarray   # (B, Kf) int32
    stuff_ok: jnp.ndarray         # (B, C) bool
    stuff_area: jnp.ndarray       # (B, C) int32
    fallback: jnp.ndarray         # (B,) bool


def pack_rendered_batch(r: RenderedImage, prefix: int = 0) -> PackedRender:
    """Compact a batched ``RenderedImage`` (device, inside the jit).

    ``prefix`` is the static length of the eagerly-fetched run prefix
    (``starts_prefix``/``values_prefix``); batches whose total run count
    exceeds it make the host fall back to a (rare) dynamic slice of the
    full buffers.
    """
    bsz, max_runs = r.pan_starts.shape
    n_pan = jnp.minimum(r.pan_nruns, max_runs).astype(jnp.int32)
    n_sem = jnp.minimum(r.sem_nruns, max_runs).astype(jnp.int32)
    counts = jnp.stack([n_pan, n_sem], axis=1).reshape(-1)       # (2B,)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )                                                            # (2B+1,)
    buf = 2 * bsz * max_runs
    j = jnp.arange(max_runs, dtype=jnp.int32)[None, :]

    def dest(base, n):
        d = base[:, None] + j
        return jnp.where(j < n[:, None], d, buf)                 # OOB -> drop

    dd = jnp.concatenate([
        dest(offs[0:2 * bsz:2], n_pan).reshape(-1),
        dest(offs[1:2 * bsz:2], n_sem).reshape(-1),
    ])
    src_s = jnp.concatenate(
        [r.pan_starts.reshape(-1), r.sem_starts.reshape(-1)])
    src_v = jnp.concatenate(
        [r.pan_values.reshape(-1), r.sem_values.reshape(-1)])
    starts = jnp.zeros((buf,), jnp.int32).at[dd].set(src_s, mode="drop")
    values = jnp.zeros((buf,), jnp.int16).at[dd].set(
        src_v.astype(jnp.int16), mode="drop")
    p = min(max(int(prefix), 0), buf)
    return PackedRender(
        starts=starts, values=values, offs=offs,
        starts_prefix=starts[:p], values_prefix=values[:p],
        takes=r.takes, order=r.order, sorted_scores=r.sorted_scores,
        sorted_classes=r.sorted_classes, stuff_ok=r.stuff_ok,
        stuff_area=r.stuff_area, fallback=r.fallback,
    )


# ---------------------------------------------------------------------------
# Single-buffer fetch coalescing
# ---------------------------------------------------------------------------
#
# The e2e drain used to device_get a ~15-leaf pytree; on a high-RTT link
# every leaf is its own transfer and the per-batch fetch cost is dominated
# by round trips, not bytes (measured ~45 ms/batch of chatter on the dev
# tunnel at ~28 ms RTT). Everything the host needs for the common case is
# therefore flattened into ONE contiguous uint8 buffer on device and
# fetched with ONE device_get; the host reinterprets fields by static
# offset. Fields are ordered by itemsize (4-byte first) so every offset
# stays aligned.

def fetch_layout(bsz: int, k_det: int, k_fuse: int, num_stuff: int,
                 prefix: int):
    """Ordered [(name, shape, dtype)] of the coalesced fetch buffer."""
    return [
        ("offs", (2 * bsz + 1,), np.int32),
        ("order", (bsz, k_fuse), np.int32),
        ("sorted_classes", (bsz, k_fuse), np.int32),
        ("sorted_scores", (bsz, k_fuse), np.float32),
        ("stuff_area", (bsz, num_stuff), np.int32),
        ("det_boxes", (bsz, k_det, 4), np.float32),
        ("det_scores", (bsz, k_det), np.float32),
        ("det_classes", (bsz, k_det), np.int32),
        ("starts", (prefix,), np.int32),
        ("values", (prefix,), np.int16),
        ("takes", (bsz, k_fuse), np.uint8),
        ("stuff_ok", (bsz, num_stuff), np.uint8),
        ("fallback", (bsz,), np.uint8),
        ("det_valid", (bsz, k_det), np.uint8),
    ]


def pack_fetch_buffer(r: "PackedRender", det: dict) -> jnp.ndarray:
    """Device side: flatten the host-needed fields of one rendered batch
    into a single (N,) uint8 buffer (inside the jit)."""
    arrays = {
        "offs": r.offs, "order": r.order,
        "sorted_classes": r.sorted_classes,
        "sorted_scores": r.sorted_scores, "stuff_area": r.stuff_area,
        "det_boxes": det["boxes"], "det_scores": det["scores"],
        "det_classes": det["classes"],
        "starts": r.starts_prefix, "values": r.values_prefix,
        "takes": r.takes, "stuff_ok": r.stuff_ok, "fallback": r.fallback,
        "det_valid": det["valid"],
    }
    bsz, k_fuse = r.takes.shape
    layout = fetch_layout(bsz, det["boxes"].shape[1], k_fuse,
                          r.stuff_ok.shape[1], r.starts_prefix.shape[0])
    parts = []
    for name, shape, dt in layout:
        x = arrays[name]
        x = x.astype(jnp.dtype(dt).name) if x.dtype != jnp.dtype(dt) \
            else x
        if x.dtype == jnp.uint8:
            parts.append(x.reshape(-1))
        else:
            parts.append(
                jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1))
    return jnp.concatenate(parts)


def unpack_fetch_buffer(buf: np.ndarray, layout) -> dict:
    """Host side: reinterpret the fetched uint8 buffer by static offsets."""
    buf = np.ascontiguousarray(buf)
    out = {}
    off = 0
    for name, shape, dt in layout:
        n = int(np.prod(shape)) * np.dtype(dt).itemsize
        out[name] = np.frombuffer(
            buf.data, dtype=dt, count=int(np.prod(shape)), offset=off,
        ).reshape(shape)
        off += n
    assert off == buf.size, (off, buf.size)
    return out


# ---------------------------------------------------------------------------
# Host-side decode
# ---------------------------------------------------------------------------

def rle_decode(starts: np.ndarray, values: np.ndarray, n_runs: int,
               total: int) -> np.ndarray:
    """Inverse of ``rle_encode`` (host, numpy)."""
    n = int(n_runs)
    s = np.asarray(starts[:n], np.int64)
    v = np.asarray(values[:n])
    lengths = np.diff(np.append(s, total))
    return np.repeat(v, lengths)


def decode_rendered_image(
    r: dict,
    canvas: Tuple[int, int],
    orig_hw: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray, List[dict]]:
    """Fetched per-image ``RenderedImage`` fields (numpy dict) ->
    (sem_seg (oh, ow) int32, panoptic (oh, ow) int32, segments_info) with
    the exact structure of ``panoptic_render.render_panoptic_output``."""
    oh_c, ow_c = canvas
    oh, ow = orig_hw
    total = oh_c * ow_c
    pan = rle_decode(
        r["pan_starts"], r["pan_values"], r["pan_nruns"], total
    ).reshape(oh_c, ow_c)[:oh, :ow].astype(np.int32)
    sem = rle_decode(
        r["sem_starts"], r["sem_values"], r["sem_nruns"], total
    ).reshape(oh_c, ow_c)[:oh, :ow].astype(np.int32)

    segments: List[dict] = []
    takes = np.asarray(r["takes"], bool)
    order = np.asarray(r["order"], np.int64)
    scores = np.asarray(r["sorted_scores"], np.float64)
    classes = np.asarray(r["sorted_classes"], np.int64)
    # detections_to_records filters by valid; segment instance_id indexes
    # those filtered arrays (slot -> filtered index = #valid slots before it)
    valid = np.asarray(r["det_valid"], bool)
    filt_idx = np.cumsum(valid) - 1
    cur = 0
    for i in range(len(takes)):
        if not takes[i]:
            continue
        cur += 1
        segments.append({
            "id": cur,
            "isthing": True,
            "score": float(scores[i]),
            "category_id": int(classes[i]),
            "instance_id": int(filt_idx[order[i]]),
        })
    stuff_ok = np.asarray(r["stuff_ok"], bool)
    stuff_area = np.asarray(r["stuff_area"], np.int64)
    for lab in range(1, len(stuff_ok)):
        if not stuff_ok[lab]:
            continue
        cur += 1
        segments.append({
            "id": cur,
            "isthing": False,
            "category_id": int(lab),
            "area": int(stuff_area[lab]),
        })
    return sem, pan, segments
