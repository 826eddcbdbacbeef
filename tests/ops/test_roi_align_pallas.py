"""Pallas ROIAlign kernel vs the XLA-gather reference (interpret mode on
CPU; compiled mode exercised on real TPU by the bench/verify drives)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)

import u2seg_tpu.ops.roi_align_pallas as rap
from u2seg_tpu.ops.roi_align import roi_align


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_pallas_matches_reference(rng):
    feat = jnp.array(rng.randn(2, 64, 64, 8).astype(np.float32))
    # boxes small enough to fit the WIN window at scale 1/4
    boxes = jnp.array([
        [8.0, 8.0, 120.0, 100.0],
        [0.0, 0.0, 60.0, 60.0],
        [100.0, 100.0, 200.0, 220.0],
    ], jnp.float32)
    bidx = jnp.array([0, 1, 0], jnp.int32)
    ref = roi_align(feat, boxes, bidx, 7, 0.25, 2)
    got = rap.roi_align_pallas(feat, boxes, bidx, 7, 0.25, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_degenerate_rois(rng):
    feat = jnp.array(rng.randn(1, 64, 64, 8).astype(np.float32))
    boxes = jnp.zeros((2, 4), jnp.float32)
    out = rap.roi_align_pallas(feat, boxes, jnp.zeros(2, jnp.int32), 7, 0.25, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_multilevel_matches_reference(rng):
    from u2seg_tpu.ops.roi_align import multilevel_roi_align
    from u2seg_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    feats = [
        jnp.array(rng.randn(2, 64, 96, 8).astype(np.float32)),
        jnp.array(rng.randn(2, 32, 48, 8).astype(np.float32)),
        jnp.array(rng.randn(2, 16, 24, 8).astype(np.float32)),
        jnp.array(rng.randn(2, 8, 12, 8).astype(np.float32)),
    ]
    strides = (4, 8, 16, 32)
    # boxes spanning multiple levels
    boxes = jnp.array([
        [10.0, 10.0, 80.0, 60.0],      # small -> level 2
        [0.0, 0.0, 200.0, 180.0],      # medium
        [5.0, 5.0, 350.0, 300.0],      # large -> coarse level
        [40.0, 30.0, 140.0, 120.0],
    ], jnp.float32)
    bidx = jnp.array([0, 1, 0, 1], jnp.int32)
    ref = multilevel_roi_align(feats, boxes, bidx, 7, strides, 2)
    got = multilevel_roi_align_pallas(feats, boxes, bidx, 7, strides, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def _ml_setup(rng):
    feats = [
        jnp.array(rng.randn(2, 64, 96, 8).astype(np.float32)),
        jnp.array(rng.randn(2, 32, 48, 8).astype(np.float32)),
        jnp.array(rng.randn(2, 16, 24, 8).astype(np.float32)),
        jnp.array(rng.randn(2, 8, 12, 8).astype(np.float32)),
    ]
    boxes = jnp.array([
        [10.0, 10.0, 80.0, 60.0],
        [0.0, 0.0, 200.0, 180.0],
        [5.0, 5.0, 350.0, 300.0],
        [40.0, 30.0, 140.0, 120.0],
        [12.0, 20.0, 44.0, 52.0],
    ], jnp.float32)
    bidx = jnp.array([0, 1, 0, 1, 1], jnp.int32)
    return feats, boxes, bidx, (4, 8, 16, 32)


def test_ml_pure_jax_ref_matches_kernel(rng):
    """The pure-JAX window/separable replica equals both the Pallas kernel
    and the gather pooler (it backs the hand-written VJP)."""
    from u2seg_tpu.ops.roi_align import multilevel_roi_align
    from u2seg_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_pallas, multilevel_roi_align_ref,
    )

    feats, boxes, bidx, strides = _ml_setup(rng)
    ref = multilevel_roi_align_ref(feats, boxes, bidx, 7, strides, 2)
    ker = multilevel_roi_align_pallas(feats, boxes, bidx, 7, strides, 2)
    gat = multilevel_roi_align(feats, boxes, bidx, 7, strides, 2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ker),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(gat),
                               rtol=1e-4, atol=1e-4)


def test_train_pooler_grad_matches_autodiff(rng):
    """custom_vjp backward (hand-derived transpose) vs autodiff of the
    pure-JAX replica of the same linear map."""
    from u2seg_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_ref, multilevel_roi_align_train,
    )

    feats, boxes, bidx, strides = _ml_setup(rng)
    cot = jnp.array(rng.randn(5, 7, 7, 8).astype(np.float32))

    def loss_train(fs):
        return jnp.sum(multilevel_roi_align_train(fs, boxes, bidx, 7, strides, 2) * cot)

    def loss_ref(fs):
        return jnp.sum(multilevel_roi_align_ref(fs, boxes, bidx, 7, strides, 2) * cot)

    g_train = jax.grad(loss_train)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    for gt, gr in zip(g_train, g_ref):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_ml_bf16_features_within_amp_tolerance(rng):
    """On bf16 features (the production compute dtype) matmul1 runs in
    native bf16 (f32 accumulate) — the reference pools under fp16
    autocast, so the kernel must stay within AMP-level error of the f32
    reference."""
    from u2seg_tpu.ops.roi_align import multilevel_roi_align
    from u2seg_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    feats, boxes, bidx, strides = _ml_setup(rng)
    ref = multilevel_roi_align(feats, boxes, bidx, 7, strides, 2)
    got = multilevel_roi_align_pallas(
        [f.astype(jnp.bfloat16) for f in feats], boxes, bidx, 7, strides, 2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.03)


def _avgpool2x_edge(f):
    """Independent replica of the kernel's virtual-level construction."""
    b, h, w, c = f.shape
    ph, pw = h + (h % 2), w + (w % 2)
    f = jnp.pad(f, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    return f.reshape(b, ph // 2, 2, pw // 2, 2, c).mean(axis=(2, 4))


def test_max_span_boxes_exact_vs_unclamped_roi_align(rng):
    """Large boxes vs the exact single-level ROIAlign oracle (NOT the
    window replica, which would share any clamping bug).

    - span == SPAN_BUDGET cells at the top real level: must be exact there;
    - span > SPAN_BUDGET at the top real level: must be exact on the
      virtual 2x-pooled level (previously these edge-clamped window rows).
    """
    from u2seg_tpu.ops.roi_align_pallas import (
        SPAN_BUDGET, multilevel_roi_align_pallas,
    )

    feats = [
        jnp.array(rng.randn(1, 240, 336, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 120, 168, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 60, 84, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 30, 42, 4).astype(np.float32)),
    ]
    strides = (4, 8, 16, 32)
    assert SPAN_BUDGET == 28
    boxes = jnp.array([
        # exactly at budget on the top real level (896 = 28 * 32)
        [16.0, 20.0, 16.0 + 896.0, 20.0 + 896.0],
        # over budget at stride 32 (29.7 cells) -> virtual level
        [5.0, 3.0, 5.0 + 950.0, 3.0 + 950.0],
        # tall thin: canonical level 16, bump cascades to the virtual level
        [30.0, 10.0, 130.0, 950.0],
    ], jnp.float32)
    bidx = jnp.zeros(3, jnp.int32)
    got = multilevel_roi_align_pallas(feats, boxes, bidx, 7, strides, 2)

    virt = _avgpool2x_edge(feats[3])
    oracle = [
        roi_align(feats[3], boxes[0:1], bidx[:1], 7, 1.0 / 32, 2),
        roi_align(virt, boxes[1:2], bidx[:1], 7, 1.0 / 64, 2),
        roi_align(virt, boxes[2:3], bidx[:1], 7, 1.0 / 64, 2),
    ]
    for i, exp in enumerate(oracle):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(exp[0]), rtol=1e-4, atol=1e-4,
            err_msg=f"box {i} diverges from exact unclamped ROIAlign",
        )


def test_train_pooler_grad_with_virtual_level_box(rng):
    """Hand-derived VJP vs autodiff of the replica when a box routes to the
    virtual level: the cotangent must chain back through the average pool
    into the top real level."""
    from u2seg_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_ref, multilevel_roi_align_train,
    )

    feats = [
        jnp.array(rng.randn(1, 240, 336, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 120, 168, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 60, 84, 4).astype(np.float32)),
        jnp.array(rng.randn(1, 30, 42, 4).astype(np.float32)),
    ]
    strides = (4, 8, 16, 32)
    boxes = jnp.array([
        [5.0, 3.0, 955.0, 953.0],     # virtual level
        [10.0, 10.0, 80.0, 60.0],     # fine level
    ], jnp.float32)
    bidx = jnp.zeros(2, jnp.int32)
    cot = jnp.array(rng.randn(2, 7, 7, 4).astype(np.float32))

    def loss_train(fs):
        return jnp.sum(
            multilevel_roi_align_train(fs, boxes, bidx, 7, strides, 2) * cot)

    def loss_ref(fs):
        return jnp.sum(
            multilevel_roi_align_ref(fs, boxes, bidx, 7, strides, 2) * cot)

    g_train = jax.grad(loss_train)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    assert float(jnp.abs(g_train[3]).sum()) > 0.0  # pool chain reached p5
    for gt, gr in zip(g_train, g_ref):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_adaptive_tiers_match_reference():
    """The per-ROI adaptive window tiers (small/large DMA extents per axis)
    must match the exact reference for mixed, all-small, all-large, and
    mixed-aspect populations — including ROIs at the right/bottom edges
    where the small-window origin clamps engage."""
    from u2seg_tpu.ops.roi_align_pallas import (
        _append_virtual_level, _ml_pallas_ext, multilevel_roi_align_ref,
    )

    rng = np.random.RandomState(11)
    b, c = 2, 32
    feats = [jnp.asarray(rng.randn(b, 64, 96, c).astype(np.float32)),
             jnp.asarray(rng.randn(b, 32, 48, c).astype(np.float32)),
             jnp.asarray(rng.randn(b, 16, 24, c).astype(np.float32))]
    strides = (4, 8, 16)
    fx, sx = _append_virtual_level(feats, strides)

    def boxes_of(sizes, n, img_w=384.0, img_h=256.0):
        xy = rng.rand(n, 2).astype(np.float32) * [img_w * 0.9, img_h * 0.9]
        wh = rng.choice(sizes, size=(n, 2)).astype(np.float32)
        bx = np.concatenate([xy, xy + wh], 1)
        bx[:, 0::2] = bx[:, 0::2].clip(0, img_w)
        bx[:, 1::2] = bx[:, 1::2].clip(0, img_h)
        return jnp.asarray(bx)

    tall = boxes_of([12.0], 8) + jnp.asarray([[0.0, 0.0, 4.0, 120.0]])
    cases = [
        boxes_of([16.0, 40.0, 90.0, 200.0], 37),   # mixed
        boxes_of([12.0, 20.0], 16),                # all small
        boxes_of([180.0, 240.0], 16),              # all large
        tall,                                       # small-x / large-y mix
    ]
    for i, bx in enumerate(cases):
        bidx = jnp.asarray(rng.randint(0, b, len(bx)), jnp.int32)
        got = _ml_pallas_ext(fx, bx, bidx, 7, sx, 2)
        ref = multilevel_roi_align_ref(feats, bx, bidx, 7, strides, 2)
        # 1e-4 like the sibling pooler tests: the small-tier origins shift
        # the nonzero taps' lanes within the 40-cell contraction, so SIMD
        # tree-reduction grouping differs from the ref by f32 reassociation
        # (~1e-5; the kernel is bit-identical to the previous fixed-window
        # kernel, which differs from the ref by the same amount)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f"case {i}")


def test_tier_boundary_exact_vs_forced_full_window(monkeypatch):
    """ROIs whose span sits EXACTLY at the small-tier budgets (12 cells y,
    13 cells x) plus one-cell-over neighbours: the adaptive-tier run must be
    bit-identical to a forced-full-window run (U2SEG_POOL_FORCE_FULL_WINDOW
    hook). A sub-tolerance weight leak onto un-DMA'd window cells would
    break exact equality here even if it passed the 1e-4 vs-ref check."""
    from u2seg_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    rng = np.random.RandomState(3)
    feats = [
        jnp.asarray(rng.randn(1, 64, 96, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 32, 48, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 16, 24, 8).astype(np.float32)),
    ]
    strides = (4, 8, 16)
    # spans in stride-4 feature cells: y budget 12 (WIN_S_Y - 4),
    # x budget 13 (WIN_S_X - 11); *4 px per cell at the finest level
    at_y, at_x = 12 * 4.0, 13 * 4.0
    boxes = jnp.asarray([
        [16.0, 20.0, 16.0 + at_x, 20.0 + at_y],          # both at budget
        [16.0, 20.0, 16.0 + at_x + 0.5, 20.0 + at_y],    # x one over
        [16.0, 20.0, 16.0 + at_x, 20.0 + at_y + 0.5],    # y one over
        [16.0, 20.0, 16.0 + at_x + 0.5, 20.0 + at_y + 0.5],  # both over
        [3.0, 5.0, 3.0 + at_x, 5.0 + at_y],              # at budget, offset
    ], jnp.float32)
    bidx = jnp.zeros(len(boxes), jnp.int32)

    got = multilevel_roi_align_pallas(feats, boxes, bidx, 7, strides, 2)
    monkeypatch.setenv("U2SEG_POOL_FORCE_FULL_WINDOW", "1")
    full = multilevel_roi_align_pallas(feats, boxes, bidx, 7, strides, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full))


def test_train_pooler_grad_tier_boundaries(monkeypatch):
    """Backward tier predication at the exact small-window budgets: the
    tier-adaptive RMW backward must be bit-identical to a forced-full-
    window run AND match autodiff of the pure-JAX replica — a cotangent
    leak outside a small tier's (16, 24) window would break both."""
    from u2seg_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_ref, multilevel_roi_align_train,
    )

    rng = np.random.RandomState(7)
    feats = [
        jnp.asarray(rng.randn(1, 64, 96, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 32, 48, 8).astype(np.float32)),
        jnp.asarray(rng.randn(1, 16, 24, 8).astype(np.float32)),
    ]
    strides = (4, 8, 16)
    at_y, at_x = 12 * 4.0, 13 * 4.0   # small budgets in px at stride 4
    boxes = jnp.asarray([
        [16.0, 20.0, 16.0 + at_x, 20.0 + at_y],              # both at budget
        [16.0, 20.0, 16.0 + at_x + 0.5, 20.0 + at_y],        # x one over
        [16.0, 20.0, 16.0 + at_x, 20.0 + at_y + 0.5],        # y one over
        [16.0, 20.0, 16.0 + at_x + 0.5, 20.0 + at_y + 0.5],  # both over
        [330.0, 210.0, 330.0 + at_x, 210.0 + at_y],          # clamped corner
    ], jnp.float32)
    bidx = jnp.zeros(len(boxes), jnp.int32)
    cot = jnp.asarray(rng.randn(len(boxes), 7, 7, 8).astype(np.float32))

    def loss_train(fs):
        return jnp.sum(
            multilevel_roi_align_train(fs, boxes, bidx, 7, strides, 2) * cot)

    def loss_ref(fs):
        return jnp.sum(
            multilevel_roi_align_ref(fs, boxes, bidx, 7, strides, 2) * cot)

    g_tier = jax.grad(loss_train)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    for gt, gr in zip(g_tier, g_ref):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)

    monkeypatch.setenv("U2SEG_POOL_FORCE_FULL_WINDOW", "1")
    g_full = jax.grad(loss_train)(feats)
    for gt, gf in zip(g_tier, g_full):
        np.testing.assert_array_equal(np.asarray(gt), np.asarray(gf))
