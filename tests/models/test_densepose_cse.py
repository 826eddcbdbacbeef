"""DensePose CSE (projects/densepose_cse.py) vs numpy oracles implementing
the reference math (densepose/modeling/cse/*, losses/embed.py,
losses/cycle_pix2shape.py)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from u2seg_tpu.projects import densepose_cse as cse  # noqa: E402


MESHES = (cse.MeshSpec("mini", 6), cse.MeshSpec("other", 4))
CFG = cse.CSEConfig(embed_size=5, meshes=MESHES,
                    embedding_dist_gauss_sigma=0.05)


def test_normalize_and_distance_matrix():
    rng = np.random.RandomState(0)
    a = rng.randn(7, 5).astype(np.float32)
    b = rng.randn(3, 5).astype(np.float32)
    na = np.asarray(cse.normalize_embeddings(jnp.asarray(a)))
    np.testing.assert_allclose(np.linalg.norm(na, axis=-1), 1.0, rtol=1e-5)
    d = np.asarray(cse.squared_euclidean_distance_matrix(
        jnp.asarray(a), jnp.asarray(b)))
    expect = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, expect, rtol=1e-4, atol=1e-4)


def test_embedders_and_container():
    emb = cse.Embedder(CFG)
    variables = emb.init(jax.random.PRNGKey(0))  # no arg: inits ALL meshes
    all_e = emb.apply(variables)
    assert set(all_e) == {"mini", "other"}
    for spec in MESHES:
        e = emb.apply(variables, spec.name)
        assert e.shape == (spec.num_vertices, CFG.embed_size)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-5)
    # parameter layout matches the reference's "embedder_{mesh}" naming
    assert "embedder_mini" in variables["params"]


def test_feature_embedder():
    m = cse.VertexFeatureEmbedder(num_vertices=8, feature_dim=3,
                                  embed_dim=5, train_features=True)
    v = m.init(jax.random.PRNGKey(1))
    e = m.apply(v)
    assert e.shape == (8, 5)
    assert v["params"]["features"].shape == (8, 3)
    assert v["params"]["embed_matrix"].shape == (3, 5)


def test_predictor_shapes():
    pred = cse.DensePoseEmbeddingPredictor(CFG)
    x = jnp.zeros((2, 14, 14, 32))
    v = pred.init(jax.random.PRNGKey(0), x)
    out = pred.apply(v, x)
    # deconv 2x then bilinear UP_SCALE(2)x -> 4x
    assert out["embedding"].shape == (2, 56, 56, CFG.embed_size)
    assert out["coarse_segm"].shape == (2, 56, 56, 2)


def _np_softmax_ce(scores, label):
    s = scores - scores.max()
    logp = s - np.log(np.exp(s).sum())
    return -logp[label]


def test_embedding_loss_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    n, s, d, p = 2, 4, 5, 3
    maps = rng.randn(n, s, s, d).astype(np.float32)
    mesh_e = [cse.normalize_embeddings(jnp.asarray(
        rng.randn(m.num_vertices, d).astype(np.float32))) for m in MESHES]
    # points at exact grid corners -> bilinear sample == direct lookup
    gx, gy = np.array([0, 1, 2]), np.array([1, 2, 3])
    pts = cse.CsePoints(
        x=jnp.asarray((gx / s) * np.ones((n, 1)), jnp.float32),
        y=jnp.asarray((gy / s) * np.ones((n, 1)), jnp.float32),
        vertex_ids=jnp.asarray(rng.randint(0, 4, (n, p)), jnp.int32),
        mesh_ids=jnp.asarray([[0, 0, 1], [1, 0, 0]], jnp.int32),
        valid=jnp.asarray([[True, True, True], [True, False, True]]),
    )
    roi_valid = jnp.asarray([True, True])
    losses = cse.embedding_loss(
        jnp.asarray(maps), pts, mesh_e, roi_valid, gauss_sigma=0.05)

    # numpy oracle
    expect = {0: [], 1: []}
    vids = np.asarray(pts.vertex_ids)
    mids = np.asarray(pts.mesh_ids)
    ok = np.asarray(pts.valid)
    for i in range(n):
        for j in range(p):
            if not ok[i, j]:
                continue
            e = maps[i, gy[j], gx[j]]
            e = e / np.linalg.norm(e)
            me = np.asarray(mesh_e[mids[i, j]])
            scores = -((e[None] - me) ** 2).sum(-1) / 0.05
            expect[mids[i, j]].append(_np_softmax_ce(scores, vids[i, j]))
    for m in (0, 1):
        np.testing.assert_allclose(
            float(losses[m]), np.mean(expect[m]), rtol=1e-4,
            err_msg=f"mesh {m}")


def test_embedding_loss_empty_mesh_is_zero():
    rng = np.random.RandomState(3)
    maps = jnp.asarray(rng.randn(1, 4, 4, 5), jnp.float32)
    mesh_e = [jnp.asarray(np.eye(6, 5), jnp.float32),
              jnp.asarray(np.eye(4, 5), jnp.float32)]
    pts = cse.CsePoints(
        x=jnp.zeros((1, 2)), y=jnp.zeros((1, 2)),
        vertex_ids=jnp.zeros((1, 2), jnp.int32),
        mesh_ids=jnp.zeros((1, 2), jnp.int32),   # all mesh 0
        valid=jnp.ones((1, 2), bool),
    )
    losses = cse.embedding_loss(maps, pts, mesh_e, jnp.asarray([True]))
    assert float(losses[1]) == 0.0
    assert np.isfinite(float(losses[0]))


def test_pix2shape_cycle_matches_numpy_oracle():
    """With fewer fg pixels than the budget, the Gumbel top-k picks exactly
    the fg set, so the loss is deterministic and checkable in numpy
    (permutation-invariant)."""
    rng = np.random.RandomState(4)
    n, s, d = 1, 4, 5
    maps = rng.randn(n, s, s, d).astype(np.float32)
    fg = np.zeros((n, s, s), bool)
    fg[0, 1:3, 1:3] = True                    # 4 fg pixels < budget 8
    mesh_e = [np.asarray(cse.normalize_embeddings(
        jnp.asarray(rng.randn(m.num_vertices, d).astype(np.float32))))
        for m in MESHES]
    loss = cse.pix_to_shape_cycle_loss(
        jnp.asarray(maps), jnp.asarray(fg), jnp.asarray([True]),
        [jnp.asarray(e) for e in mesh_e], jax.random.PRNGKey(0),
        num_pixels=8, temp_p2v=0.05, temp_v2p=0.05, norm_p=2)

    # numpy oracle over the fg pixels in flat order
    idx = np.where(fg[0].reshape(-1))[0]
    coords = np.stack([idx // s, idx % s], -1).astype(np.float64)
    pd = ((coords[:, None] - coords[None]) ** 2).sum(-1)
    e = maps[0].reshape(s * s, d)[idx]
    e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    total = 0.0
    for me in mesh_e:
        sim = e @ me.T
        c_pv = np.exp(sim / 0.05)
        c_pv /= c_pv.sum(1, keepdims=True)
        c_vp = np.exp(sim.T / 0.05)
        c_vp /= c_vp.sum(1, keepdims=True)
        c_cycle = c_pv @ c_vp
        total += np.sqrt(((pd * c_cycle) ** 2).sum())
    np.testing.assert_allclose(float(loss), total / len(mesh_e), rtol=1e-3)


def test_full_loss_dict_and_finite_grads():
    rng = np.random.RandomState(5)
    n, s_in = 2, 8
    cfg = cse.CSEConfig(embed_size=5, meshes=MESHES, pix2shape_enabled=True,
                        pix2shape_num_pixels=16)
    pred = cse.DensePoseEmbeddingPredictor(cfg)
    emb = cse.Embedder(cfg)
    x = jnp.asarray(rng.randn(n, s_in, s_in, 16), jnp.float32)
    pv = pred.init(jax.random.PRNGKey(0), x)
    ev = emb.init(jax.random.PRNGKey(1))
    s_out = 4 * s_in
    pts = cse.CsePoints(
        x=jnp.asarray(rng.rand(n, 4), jnp.float32),
        y=jnp.asarray(rng.rand(n, 4), jnp.float32),
        vertex_ids=jnp.asarray(rng.randint(0, 4, (n, 4)), jnp.int32),
        mesh_ids=jnp.asarray(rng.randint(0, 2, (n, 4)), jnp.int32),
        valid=jnp.ones((n, 4), bool),
    )
    segm_gt = jnp.asarray(rng.randint(0, 2, (n, s_out, s_out)), jnp.int32)

    def loss_fn(params):
        out = pred.apply({"params": params["p"]}, x)
        mesh_e = [emb.apply({"params": params["e"]}, m.name)
                  for m in cfg.meshes]
        losses = cse.densepose_cse_losses(
            out, pts, segm_gt, jnp.ones((n,), bool), mesh_e, cfg,
            rng=jax.random.PRNGKey(2))
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        {"p": pv["params"], "e": ev["params"]})
    assert set(losses) == {"loss_densepose_S", "loss_densepose_Emini",
                           "loss_densepose_Eother", "loss_pix2shape"}
    assert np.isfinite(float(total))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_nearest_vertex_inference():
    # craft embeddings so pixel (i, j) is closest to vertex (i + j) % K
    k, d, s = 5, 5, 3
    mesh = np.eye(k, d, dtype=np.float32)
    emb_map = np.zeros((s, s, d), np.float32)
    for i in range(s):
        for j in range(s):
            emb_map[i, j] = mesh[(i + j) % k] * 2.0
    segm = np.zeros((s, s, 2), np.float32)
    segm[..., 1] = 1.0
    vids, fg = cse.cse_nearest_vertices(
        jnp.asarray(emb_map), jnp.asarray(segm), jnp.asarray(mesh))
    expect = (np.add.outer(np.arange(s), np.arange(s))) % k
    np.testing.assert_array_equal(np.asarray(vids), expect)
    assert bool(np.all(np.asarray(fg)))


@pytest.mark.slow
def test_cse_heads_train_and_inference():
    """Full CSE ROI-heads path on tiny FPN features: inference shapes and
    a train step with finite losses for every mesh."""
    rng = np.random.RandomState(7)
    cfg = cse.CSEConfig(embed_size=5, meshes=MESHES)
    heads = cse.DensePoseCseHeads(cfg, head_convs=2, head_dim=16,
                                  pooler_resolution=8)
    b, r = 2, 3
    feats = {f"p{i+2}": jnp.asarray(
        rng.randn(b, 32 // (2 ** i), 32 // (2 ** i), 8), jnp.float32)
        for i in range(4)}
    xy = rng.rand(b, r, 2) * 60
    wh = rng.rand(b, r, 2) * 40 + 8
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    v = heads.init(jax.random.PRNGKey(0), feats, boxes)
    out = heads.apply(v, feats, boxes)
    s_out = 8 * 4  # pool 8, deconv 2x, bilinear 2x
    assert out["embedding"].shape == (b, r, s_out, s_out, cfg.embed_size)
    assert out["coarse_segm"].shape == (b, r, s_out, s_out, 2)

    emb = cse.Embedder(cfg)
    ev = emb.init(jax.random.PRNGKey(1))
    mesh_e = [emb.apply(ev, m.name) for m in cfg.meshes]
    n = b * r
    pts = cse.CsePoints(
        x=jnp.asarray(rng.rand(n, 4), jnp.float32),
        y=jnp.asarray(rng.rand(n, 4), jnp.float32),
        vertex_ids=jnp.asarray(rng.randint(0, 4, (n, 4)), jnp.int32),
        mesh_ids=jnp.asarray(rng.randint(0, 2, (n, 4)), jnp.int32),
        valid=jnp.ones((n, 4), bool),
    )
    segm_gt = jnp.asarray(rng.randint(0, 2, (n, s_out, s_out)), jnp.int32)
    losses = heads.apply(
        v, feats, boxes, train=True, points=pts, coarse_segm_gt=segm_gt,
        roi_live=jnp.ones((b, r), bool), mesh_embeddings=mesh_e,
    )
    assert set(losses) == {"loss_densepose_S", "loss_densepose_Emini",
                           "loss_densepose_Eother"}
    assert all(np.isfinite(float(x)) for x in losses.values())
