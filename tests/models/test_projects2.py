"""Tests for the PointSup / Rethinking-BN / TensorMask project ports."""
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)
import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- PointSup

def test_point_coords_wrt_box_and_ignore():
    from u2seg_tpu.projects.pointsup import prepare_point_targets

    boxes = jnp.array([[10.0, 20.0, 30.0, 60.0]])
    pts = jnp.array([[[20.0, 40.0], [5.0, 40.0], [10.0, 20.0]]])
    labels = jnp.array([[1.0, 1.0, 0.0]])
    coords, lab = prepare_point_targets(boxes, pts, labels)
    np.testing.assert_allclose(np.asarray(coords[0, 0]), [0.5, 0.5])
    assert float(lab[0, 0]) == 1.0
    assert float(lab[0, 1]) == -1.0          # left of box -> ignored
    np.testing.assert_allclose(np.asarray(coords[0, 2]), [0.0, 0.0])
    assert float(lab[0, 2]) == 0.0


def test_point_sup_mask_loss_perfect_logits_small():
    from u2seg_tpu.projects.pointsup import point_sup_mask_loss

    r, m, k, p = 2, 8, 3, 6
    rng = np.random.RandomState(0)
    # mask logit maps: class-c map is +10 in left half, -10 in right half
    logits = np.zeros((r, m, m, k), np.float32)
    logits[:, :, : m // 2, :] = 10.0
    logits[:, :, m // 2:, :] = -10.0
    coords = rng.rand(r, p, 2).astype(np.float32)
    labels = (coords[..., 0] < 0.5).astype(np.float32)  # left = fg
    # keep points away from the boundary so bilinear blur doesn't flip them
    coords[..., 0] = np.where(labels > 0, 0.2, 0.8)
    loss = point_sup_mask_loss(
        jnp.array(logits), jnp.zeros(r, jnp.int32), jnp.array(coords),
        jnp.array(labels), jnp.ones(r, bool),
    )
    assert float(loss) < 1e-3

    # ignored points (-1) contribute nothing: flipping them doesn't move loss
    labels2 = labels.copy()
    labels2[:, 0] = -1.0
    loss2 = point_sup_mask_loss(
        jnp.array(logits), jnp.zeros(r, jnp.int32), jnp.array(coords),
        jnp.array(labels2), jnp.ones(r, bool),
    )
    assert float(loss2) < 1e-3


def test_sample_point_annotations_static_subset():
    from u2seg_tpu.projects.pointsup import sample_point_annotations

    rng = np.random.RandomState(1)
    coords = jnp.array(rng.rand(3, 10, 2).astype(np.float32))
    labels = jnp.array(rng.randint(0, 2, (3, 10)).astype(np.float32))
    c2, l2 = sample_point_annotations(jax.random.PRNGKey(0), coords, labels, 4)
    assert c2.shape == (3, 4, 2) and l2.shape == (3, 4)
    # sampled pairs must come from the originals with matching labels
    for i in range(3):
        orig = {tuple(np.round(np.asarray(coords[i, j]), 5)): float(labels[i, j])
                for j in range(10)}
        for j in range(4):
            key = tuple(np.round(np.asarray(c2[i, j]), 5))
            assert key in orig and orig[key] == float(l2[i, j])


# ------------------------------------------------------------ Rethinking-BN

def test_batchnorm_batch_stats_uses_batch_moments_at_eval(rng):
    from u2seg_tpu.projects.rethinking_bn import BatchNormBatchStats

    x = jnp.array(rng.randn(4, 8, 8, 16).astype(np.float32) * 3 + 1)
    mod = BatchNormBatchStats()
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(vars_, x)          # eval: no mutable batch_stats
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # running stats update only when mutable (training)
    _, new_vars = mod.apply(vars_, x, mutable=["batch_stats"])
    assert not np.allclose(
        np.asarray(new_vars["batch_stats"]["mean"]), 0.0
    )


def test_shared_levels_norm_one_set_of_moments(rng):
    import flax.linen as nn

    from u2seg_tpu.projects.rethinking_bn import shared_levels_norm

    feats = [
        jnp.array(rng.randn(2, 8, 8, 4).astype(np.float32) * 2 + 5),
        jnp.array(rng.randn(2, 4, 4, 4).astype(np.float32) * 0.5 - 3),
    ]

    class M(nn.Module):
        @nn.compact
        def __call__(self, feats):
            bn = nn.BatchNorm(use_running_average=None, momentum=0.9)
            return shared_levels_norm(bn, feats, train=True)

    m = M()
    vars_ = m.init(jax.random.PRNGKey(0), feats)
    outs, _ = m.apply(vars_, feats, mutable=["batch_stats"])
    # concatenated output is standardized as ONE population
    cat = np.concatenate([np.asarray(o).reshape(-1, 4) for o in outs], 0)
    np.testing.assert_allclose(cat.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(cat.std(0), 1.0, atol=1e-2)
    # but each level individually is NOT (shared moments, shifted levels)
    lvl0 = np.asarray(outs[0]).reshape(-1, 4)
    assert abs(lvl0.mean()) > 0.2


def test_shuffle_bn_roundtrip_multidevice():
    from u2seg_tpu.projects.rethinking_bn import batch_shuffle, batch_unshuffle
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))
    x = jnp.arange(len(devs) * 2 * 3, dtype=jnp.float32).reshape(-1, 3)

    def body(xs):
        sh, perm = batch_shuffle(xs, jax.random.PRNGKey(3), "data")
        return batch_unshuffle(sh, perm, "data")

    out = jax.jit(shard_map(
        body, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_rep=False,
    ))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


# -------------------------------------------------------------- TensorMask

def _swap_align2nat_numpy(x, lam, pad_val):
    """Brute-force replica of SwapAlign2Nat_cuda.cu (channels-last)."""
    n, hin, win, c = x.shape
    vin = int(round(np.sqrt(c)))
    uin = vin
    x5 = x.reshape(n, hin, win, vin, uin)
    vout, uout = lam * vin, lam * uin
    hout = int(np.ceil(hin / lam))
    wout = int(np.ceil(win / lam))

    def val(ni, yi, xi, vi, ui):
        if (yi < 0 or yi >= hin or xi < 0 or xi >= win
                or vi < 0 or vi >= vin or ui < 0 or ui >= uin):
            return pad_val
        return x5[ni, yi, xi, vi, ui]

    out = np.zeros((n, hout, wout, vout, uout), np.float32)
    for ni in range(n):
        for y in range(hout):
            for xq in range(wout):
                for v in range(vout):
                    for u in range(uout):
                        oy = y * lam + v - vout / 2.0 + 0.5
                        ox = xq * lam + u - uout / 2.0 + 0.5
                        ov = (v + 0.5) / lam - 0.5
                        ou = (u + 0.5) / lam - 0.5
                        acc = 0.0
                        for yi, wy in ((int(np.floor(oy)), 1 - (oy - np.floor(oy))),
                                       (int(np.ceil(oy)), oy - np.floor(oy))):
                            for xi, wx in ((int(np.floor(ox)), 1 - (ox - np.floor(ox))),
                                           (int(np.ceil(ox)), ox - np.floor(ox))):
                                for vi, wv in ((int(np.floor(ov)), 1 - (ov - np.floor(ov))),
                                               (int(np.ceil(ov)), ov - np.floor(ov))):
                                    for ui, wu in ((int(np.floor(ou)), 1 - (ou - np.floor(ou))),
                                                   (int(np.ceil(ou)), ou - np.floor(ou))):
                                        acc += wy * wx * wv * wu * val(ni, yi, xi, vi, ui)
                        out[ni, y, xq, v, u] = acc
    return out.reshape(n, hout, wout, vout * uout)


def test_swap_align2nat_matches_bruteforce(rng):
    from u2seg_tpu.projects.tensormask import swap_align2nat

    x = rng.randn(1, 6, 8, 9).astype(np.float32)   # V=U=3
    for lam in (1, 2):
        ref = _swap_align2nat_numpy(x, lam, pad_val=-6.0)
        got = swap_align2nat(jnp.array(x), lam, pad_val=-6.0)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_swap_align2nat_identity_lambda1_interior():
    from u2seg_tpu.projects.tensormask import swap_align2nat

    # lambda=1: ov=v, oy=y+v-V/2+0.5 — pure re-centering; check shape + grad
    x = jnp.ones((1, 8, 8, 4))
    y = swap_align2nat(x, 1)
    assert y.shape == (1, 8, 8, 4)
    g = jax.grad(lambda a: jnp.sum(swap_align2nat(a, 2)))(x)
    assert np.isfinite(np.asarray(g)).all()


# -------------------------------------------------------------- DensePose

def test_densepose_head_shapes_and_losses(rng):
    from u2seg_tpu.projects.densepose import (
        DensePoseConfig, DensePosePoints, DensePoseROIHead,
        densepose_chart_inference, densepose_chart_losses,
    )

    cfg = DensePoseConfig(num_stacked_convs=2, conv_head_dim=16)
    mod = DensePoseROIHead(cfg)
    pooled = jnp.array(rng.randn(3, 14, 14, 8).astype(np.float32))
    vars_ = mod.init(jax.random.PRNGKey(0), pooled)
    out = mod.apply(vars_, pooled)
    s = 14 * 2 * cfg.up_scale
    assert out["coarse_segm"].shape == (3, s, s, 2)
    assert out["fine_segm"].shape == (3, s, s, 25)
    assert out["u"].shape == (3, s, s, 25)

    pts = DensePosePoints(
        coords=jnp.array(rng.rand(3, 5, 2).astype(np.float32)),
        fine_labels=jnp.array(rng.randint(0, 25, (3, 5)).astype(np.int32)),
        u=jnp.array(rng.rand(3, 5).astype(np.float32)),
        v=jnp.array(rng.rand(3, 5).astype(np.float32)),
        valid=jnp.ones((3, 5), bool),
    )
    coarse_gt = jnp.array(rng.randint(0, 2, (3, s, s)).astype(np.int32))
    roi_valid = jnp.array([True, True, False])
    losses = densepose_chart_losses(out, pts, coarse_gt, roi_valid, cfg)
    assert set(losses) == {"loss_densepose_U", "loss_densepose_V",
                           "loss_densepose_I", "loss_densepose_S"}
    for v in losses.values():
        assert np.isfinite(float(v))

    # losses are differentiable end-to-end
    def f(p):
        o = mod.apply({"params": p}, pooled)
        return sum(densepose_chart_losses(o, pts, coarse_gt, roi_valid,
                                          cfg).values())

    g = jax.grad(f)(vars_["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))

    i_map, u_map, v_map = densepose_chart_inference(out)
    assert i_map.shape == (3, s, s)
    # background pixels carry I=0 and U=V=0
    bg = np.asarray(i_map) == 0
    assert (np.asarray(u_map)[bg] == 0).all()


def test_densepose_point_metrics_perfect():
    from u2seg_tpu.projects.densepose import (
        DensePoseConfig, DensePosePoints, point_iuv_errors,
    )

    s, k = 16, 25
    # constant-over-space predictions: fine label 3 wins, u=0.4, v=0.7
    fine = np.full((1, s, s, k), -5.0, np.float32)
    fine[..., 3] = 5.0
    u = np.zeros((1, s, s, k), np.float32)
    u[..., 3] = 0.4
    v = np.zeros((1, s, s, k), np.float32)
    v[..., 3] = 0.7
    outputs = {"fine_segm": jnp.array(fine), "u": jnp.array(u),
               "v": jnp.array(v)}
    # interior points (bilinear needs margin from the border)
    pts = DensePosePoints(
        coords=jnp.array([[[0.3, 0.4], [0.6, 0.5]]], jnp.float32),
        fine_labels=jnp.array([[3, 3]], jnp.int32),
        u=jnp.array([[0.4, 0.4]], jnp.float32),
        v=jnp.array([[0.7, 0.7]], jnp.float32),
        valid=jnp.ones((1, 2), bool),
    )
    m = point_iuv_errors(outputs, pts)
    assert float(m["i_accuracy"]) == 1.0
    assert float(m["u_mae"]) < 1e-5 and float(m["v_mae"]) < 1e-5


def test_tensormask_assignment_rule():
    from u2seg_tpu.projects.tensormask import tensormask_assign
    from u2seg_tpu.structures.instances import GtInstances

    gt = GtInstances(
        boxes=jnp.array([[10.0, 10.0, 18.0, 18.0],
                         [0.0, 0.0, 1.0, 1.0]]),
        classes=jnp.array([2, 0], jnp.int32),
        valid=jnp.array([True, False]),
        masks=jnp.ones((2, 8, 8), jnp.float32),
    )
    anchors = jnp.array([
        [8.0, 8.0, 20.0, 20.0],    # contains gt0, centered -> fg
        [40.0, 40.0, 52.0, 52.0],  # far away -> bg
        [9.0, 9.0, 60.0, 60.0],    # contains but way too large -> bg
    ])
    units = jnp.array([4.0, 4.0, 4.0])
    matches, fg = tensormask_assign(gt, anchors, units, min_anchor_size=12.0)
    fg = np.asarray(fg)
    assert fg.tolist() == [True, False, False]
    assert int(matches[0]) == 0


def test_tensormask_train_and_inference_e2e(rng):
    from u2seg_tpu.projects.tensormask import TensorMask, TensorMaskConfig
    from u2seg_tpu.structures.instances import GtInstances

    cfg = TensorMaskConfig(
        num_classes=5, in_features=("p2", "p3"), num_convs=1,
        cls_channels=8, bbox_channels=8, mask_channels=8, mask_sizes=(3,),
        topk_candidates=50, max_detections=10, max_fg=8, mask_out_size=14,
    )
    model = TensorMask(cfg)
    feats = {
        "p2": jnp.array(rng.randn(1, 16, 16, 8).astype(np.float32)),
        "p3": jnp.array(rng.randn(1, 8, 8, 8).astype(np.float32)),
    }
    sizes = jnp.array([[64, 64]], jnp.int32)
    gt = GtInstances(
        boxes=jnp.array([[[10.0, 10.0, 18.0, 18.0]]]),
        classes=jnp.array([[2]], jnp.int32),
        valid=jnp.array([[True]]),
        masks=jnp.ones((1, 1, 16, 16), jnp.float32),
    )
    vars_ = model.init(jax.random.PRNGKey(0), feats, sizes, gt=gt, train=True)
    losses = model.apply(vars_, feats, sizes, gt=gt, train=True)
    assert set(losses) == {"loss_cls", "loss_box_reg", "loss_mask"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_mask"]) > 0.0   # the fg anchor exists

    # gradients flow through all three losses (incl. SwapAlign2Nat)
    g = jax.grad(
        lambda p: sum(model.apply({"params": p}, feats, sizes, gt=gt,
                                  train=True).values())
    )(vars_["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))

    out = model.apply(vars_, feats, sizes, train=False)
    assert out["boxes"].shape == (1, 10, 4)
    assert out["mask_patches"].shape == (1, 10, 14, 14)
    assert np.isfinite(np.asarray(out["mask_patches"])).all()


def test_densepose_uv_confidence_losses(rng):
    """Confidence-aware UV regression (ref chart_with_confidences.py):
    predictor grows sigma_2 (+kappa) heads; the UV loss becomes the
    Gaussian NLL — checked against a numpy oracle at grid-corner points."""
    import math

    from u2seg_tpu.projects.densepose import (
        DensePoseConfig, DensePosePoints, DensePoseROIHead,
        densepose_chart_losses,
    )

    for conf_type in ("iid_iso", "indep_aniso"):
        cfg = DensePoseConfig(num_stacked_convs=1, conv_head_dim=8,
                              uv_confidence=conf_type)
        mod = DensePoseROIHead(cfg)
        pooled = jnp.array(rng.randn(2, 7, 7, 4).astype(np.float32))
        vars_ = mod.init(jax.random.PRNGKey(0), pooled)
        out = mod.apply(vars_, pooled)
        s = 7 * 2 * cfg.up_scale
        assert out["sigma_2"].shape == (2, s, s, 25)
        if conf_type == "indep_aniso":
            assert out["kappa_u"].shape == (2, s, s, 25)

        # points at exact grid corners -> sampling == lookup
        gx = np.array([1, 3, 5]); gy = np.array([2, 4, 6])
        pts = DensePosePoints(
            coords=jnp.array(np.stack([gx / s, gy / s], -1)[None].repeat(
                2, 0).astype(np.float32)),
            fine_labels=jnp.array(
                rng.randint(1, 25, (2, 3)).astype(np.int32)),
            u=jnp.array(rng.rand(2, 3).astype(np.float32)),
            v=jnp.array(rng.rand(2, 3).astype(np.float32)),
            valid=jnp.ones((2, 3), bool),
        )
        coarse_gt = jnp.zeros((2, s, s), jnp.int32)
        roi_valid = jnp.array([True, True])
        losses = densepose_chart_losses(out, pts, coarse_gt, roi_valid, cfg)
        assert "loss_densepose_UV" in losses
        assert "loss_densepose_U" not in losses

        # numpy oracle
        ch = np.asarray(pts.fine_labels)
        total = 0.0
        eps = cfg.uv_confidence_epsilon
        for i in range(2):
            for j in range(3):
                c = ch[i, j]
                pix = (gy[j], gx[j])
                u_est = float(out["u"][i][pix][c])
                v_est = float(out["v"][i][pix][c])
                s_est = float(out["sigma_2"][i][pix][c])
                sigma2 = math.log1p(math.exp(s_est)) + eps
                du = u_est - float(pts.u[i, j])
                dv = v_est - float(pts.v[i, j])
                d2 = du * du + dv * dv
                if conf_type == "iid_iso":
                    nll = 0.5 * (math.log(2 * math.pi)
                                 + 2 * math.log(sigma2) + d2 / sigma2)
                else:
                    ku = float(out["kappa_u"][i][pix][c])
                    kv = float(out["kappa_v"][i][pix][c])
                    r2 = ku * ku + kv * kv
                    dr = du * ku + dv * kv
                    den = sigma2 * (sigma2 + r2)
                    nll = 0.5 * (math.log(2 * math.pi) + math.log(den)
                                 + d2 / sigma2 - dr * dr / den)
                total += nll
        np.testing.assert_allclose(
            float(losses["loss_densepose_UV"]), total * cfg.w_points,
            rtol=2e-4)

        # differentiable through the confidence heads
        def f(p):
            o = mod.apply({"params": p}, pooled)
            return sum(densepose_chart_losses(
                o, pts, coarse_gt, roi_valid, cfg).values())

        g = jax.grad(f)(vars_["params"])
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))
