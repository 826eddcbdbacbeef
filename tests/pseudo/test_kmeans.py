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
