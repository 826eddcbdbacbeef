import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.pseudo.kmeans import (
    density_from_knn, kmeans, knn, select_representatives,
)


def gaussian_clusters(rng, k=4, per=50, d=16, spread=0.05):
    centers = rng.randn(k, d).astype(np.float32) * 2
    feats = np.concatenate([
        centers[i] + rng.randn(per, d).astype(np.float32) * spread
        for i in range(k)
    ])
    labels = np.repeat(np.arange(k), per)
    return feats, labels


def test_kmeans_recovers_clusters(rng):
    feats, labels = gaussian_clusters(rng)
    _, assign = kmeans(jax.random.PRNGKey(0), jnp.array(feats), 4,
                       num_iters=30, metric="l2")
    assign = np.asarray(assign)
    # purity: every found cluster maps to one true cluster
    purity = 0
    for c in range(4):
        members = labels[assign == c]
        if len(members):
            purity += np.bincount(members).max()
    assert purity / len(labels) > 0.95


def test_kmeans_cosine_unit_centroids(rng):
    feats, _ = gaussian_clusters(rng)
    cents, assign = kmeans(jax.random.PRNGKey(1), jnp.array(feats), 4,
                           num_iters=20, metric="cosine")
    norms = np.linalg.norm(np.asarray(cents), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    assert len(np.unique(np.asarray(assign))) == 4


def test_knn_finds_true_neighbors(rng):
    feats, labels = gaussian_clusters(rng, k=3, per=20, spread=0.01)
    dists, idx = knn(jnp.array(feats), k=5, metric="l2", chunk=16)
    idx = np.asarray(idx)
    # neighbours share the sample's label (tight clusters)
    same = labels[idx] == labels[:, None]
    assert same.mean() > 0.99
    # self excluded
    assert not (idx == np.arange(len(feats))[:, None]).any()


def test_knn_cosine_matches_bruteforce(rng):
    feats = rng.randn(30, 8).astype(np.float32)
    d, idx = knn(jnp.array(feats), k=3, metric="cosine", chunk=8)
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = fn @ fn.T
    np.fill_diagonal(sim, -np.inf)
    ref_idx = np.argsort(-sim, axis=1)[:, :3]
    # compare neighbor sets (ties can reorder)
    for i in range(30):
        assert set(np.asarray(idx)[i]) == set(ref_idx[i])


def test_density_and_representatives(rng):
    feats, labels = gaussian_clusters(rng, k=2, per=30, spread=0.05)
    dists, _ = knn(jnp.array(feats), k=5, metric="l2", chunk=16)
    dens = np.asarray(density_from_knn(dists, metric="l2"))
    _, assign = kmeans(jax.random.PRNGKey(2), jnp.array(feats), 2,
                       num_iters=20, metric="l2")
    reps = select_representatives(feats, np.asarray(assign), dens, 2)
    assert (reps >= 0).all()
    assert assign[reps[0]] == 0 and assign[reps[1]] == 1


# ---------------------------------------------------------------------------
# Regularized USL selection (ref nn_utils_imagenet.py:105-213)
# ---------------------------------------------------------------------------

def _oracle_selection(feats, labels, neighbors_dist, num_clusters,
                      final_sample_num, iters, w, momentum, horizon_num,
                      alpha, exclude_same_cluster):
    """Dense numpy transcription of the published USL selection protocol,
    as an independent oracle for the chunked/top_k device implementation."""
    n = len(feats)
    reg = np.zeros(n)
    selected = []
    for it in range(iters):
        selected = []
        for c in range(num_clusters):
            if len(selected) == final_sample_num:
                break
            members = np.nonzero(labels == c)[0]
            if len(members) == 0:
                continue
            scores = 1.0 / neighbors_dist[members] - w * reg[members]
            selected.append(members[np.argmax(scores)])
        if it < iters - 1:
            # f32 matmul-form distances: same arithmetic as the device path
            # (the oracle checks the algorithm, not float precision)
            sel = feats[selected]
            d2 = np.maximum(
                (feats ** 2).sum(-1)[:, None]
                - 2 * feats @ sel.T
                + (sel ** 2).sum(-1)[None, :],
                0.0,
            ).astype(np.float32)
            order = np.argsort(d2, axis=1, kind="stable")[:, :min(horizon_num, len(selected))]
            dmin = np.take_along_axis(d2, order, axis=1)
            if exclude_same_cluster:
                dmin = np.where(order == labels[:, None], 1e10, dmin)
            else:
                # distance-to-oneself ignored (the published algorithm's
                # d2 == 0 rule, expressed as an index identity)
                sel_arr = np.asarray(selected)
                is_self = sel_arr[order] == np.arange(len(feats))[:, None]
                dmin = np.where(is_self | (dmin == 0.0), 1e10, dmin)
            new_reg = (1.0 / dmin ** alpha).sum(1)
            reg = reg * momentum + new_reg * (1 - momentum)
    return np.asarray(selected, np.int64)


def test_regularized_selection_matches_oracle(rng):
    from u2seg_tpu.pseudo.kmeans import select_representatives_regularized

    feats, _ = gaussian_clusters(rng, k=6, per=30, d=8, spread=0.4)
    _, assign = kmeans(jax.random.PRNGKey(1), jnp.array(feats), 6,
                       num_iters=20, metric="l2")
    assign = np.asarray(assign)
    dists, _ = knn(jnp.array(feats), k=5, metric="l2")
    nd = np.asarray(density_from_knn(dists, metric="l2"), np.float64) + 1e-3

    for excl in (True, False):
        got = select_representatives_regularized(
            feats, assign, nd, num_clusters=6, final_sample_num=6,
            iters=3, w=0.5, momentum=0.25, horizon_num=4, alpha=1.0,
            exclude_same_cluster=excl,
        )
        want = _oracle_selection(
            feats.astype(np.float32), assign, nd, 6, 6, 3, 0.5, 0.25, 4,
            1.0, excl,
        )
        np.testing.assert_array_equal(got, want)


def test_regularized_selection_spreads_picks(rng):
    """With a strong regularizer the re-selection must move picks apart
    when two clusters' densest points nearly coincide."""
    from u2seg_tpu.pseudo.kmeans import select_representatives_regularized

    rng = np.random.RandomState(7)
    # two clusters whose densest members are adjacent near the origin
    a = np.concatenate([rng.randn(20, 4) * 0.02,
                        rng.randn(5, 4) * 0.02 + 3.0]).astype(np.float32)
    b = np.concatenate([rng.randn(20, 4) * 0.02 + 0.05,
                        rng.randn(5, 4) * 0.02 - 3.0]).astype(np.float32)
    feats = np.concatenate([a, b])
    labels = np.repeat([0, 1], 25)
    dists, _ = knn(jnp.array(feats), k=5, metric="l2")
    nd = np.asarray(density_from_knn(dists, metric="l2"), np.float64) + 1e-4

    first = select_representatives_regularized(
        feats, labels, nd, 2, iters=1)
    reg = select_representatives_regularized(
        feats, labels, nd, 2, iters=3, w=10.0, horizon_num=2,
        exclude_same_cluster=False)
    d_first = np.linalg.norm(feats[first[0]] - feats[first[1]])
    d_reg = np.linalg.norm(feats[reg[0]] - feats[reg[1]])
    assert d_reg >= d_first
