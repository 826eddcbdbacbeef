"""On-device kNN + k-means for the pseudo-label clustering stage.

Counterpart of ``u2seg/Instance_Clustering/shared/utils/nn_utils.py``
(partitioned_kNN :228, KMeans :304, run_kMeans :382) — the reference does
chunked GPU (or pykeops) distance computation; on TPU both kNN and Lloyd
iterations are plain batched matmuls (MXU-bound), chunked only to bound
memory. Supports cosine and L2 metrics like the reference.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def knn(
    feats: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbours of every row among all rows (self excluded).

    Returns (dists (N, k), idx (N, k)). cosine: similarity (higher=closer);
    l2: negative squared distance, so top_k works uniformly.
    """
    n, d = feats.shape
    q = _normalize(feats) if metric == "cosine" else feats
    base = q
    sq = jnp.sum(base * base, axis=-1)

    num_chunks = (n + chunk - 1) // chunk
    pad_n = num_chunks * chunk
    qp = jnp.pad(q, ((0, pad_n - n), (0, 0)))

    def body(i, carry):
        dists, idxs = carry
        rows = jax.lax.dynamic_slice(qp, (i * chunk, 0), (chunk, d))
        if metric == "cosine":
            sim = rows @ base.T
        else:
            sim = -(
                jnp.sum(rows * rows, -1)[:, None] - 2 * rows @ base.T + sq[None, :]
            )
        # exclude self-match
        row_ids = i * chunk + jnp.arange(chunk)
        col_ids = jnp.arange(n)
        sim = jnp.where(row_ids[:, None] == col_ids[None, :], -jnp.inf, sim)
        topv, topi = jax.lax.top_k(sim, k)
        dists = jax.lax.dynamic_update_slice(dists, topv, (i * chunk, 0))
        idxs = jax.lax.dynamic_update_slice(idxs, topi, (i * chunk, 0))
        return dists, idxs

    dists = jnp.zeros((pad_n, k), feats.dtype)
    idxs = jnp.zeros((pad_n, k), jnp.int32)
    dists, idxs = jax.lax.fori_loop(0, num_chunks, body, (dists, idxs))
    return dists[:n], idxs[:n]


@functools.partial(
    jax.jit, static_argnames=("num_clusters", "num_iters", "metric", "chunk")
)
def kmeans(
    rng: jax.Array,
    feats: jnp.ndarray,
    num_clusters: int,
    num_iters: int = 100,
    metric: str = "cosine",
    chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's algorithm. Returns (centroids (K, D), assignments (N,)).

    cosine: spherical k-means (centroids re-normalized each step, ref
    KMeans nn_utils.py:304-380); l2: standard. Empty clusters keep their
    previous centroid.
    """
    n, d = feats.shape
    x = _normalize(feats) if metric == "cosine" else feats
    centroids = _kmeans_pp_init(rng, x, num_clusters, metric)

    def assign(c):
        if metric == "cosine":
            return jnp.argmax(x @ c.T, axis=1).astype(jnp.int32)
        d2 = (
            jnp.sum(x * x, 1)[:, None] - 2 * x @ c.T + jnp.sum(c * c, 1)[None, :]
        )
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    def step(_, c):
        a = assign(c)
        onehot = jax.nn.one_hot(a, num_clusters, dtype=x.dtype)  # (N, K)
        sums = onehot.T @ x                                      # (K, D)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_c = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), c)
        if metric == "cosine":
            new_c = _normalize(new_c)
        return new_c

    centroids = jax.lax.fori_loop(0, num_iters, step, centroids)
    return centroids, assign(centroids)


def _kmeans_pp_init(rng, x, num_clusters: int, metric: str) -> jnp.ndarray:
    """k-means++ seeding: D^2-weighted sequential sampling (avoids the
    cluster-collapse local optima of uniform point init)."""
    n, d = x.shape

    def dist2_to(c):
        if metric == "cosine":
            return jnp.maximum(1.0 - x @ c, 0.0)
        return jnp.sum((x - c[None, :]) ** 2, axis=1)

    rng, sub = jax.random.split(rng)
    first = x[jax.random.randint(sub, (), 0, n)]
    cents = jnp.zeros((num_clusters, d), x.dtype).at[0].set(first)
    min_d2 = dist2_to(first)

    def body(i, carry):
        cents, min_d2, rng = carry
        rng, sub = jax.random.split(rng)
        logits = jnp.log(jnp.maximum(min_d2, 1e-20))
        idx = jax.random.categorical(sub, logits)
        c = x[idx]
        cents = cents.at[i].set(c)
        min_d2 = jnp.minimum(min_d2, dist2_to(c))
        return cents, min_d2, rng

    cents, _, _ = jax.lax.fori_loop(1, num_clusters, body, (cents, min_d2, rng))
    return cents


def density_from_knn(knn_dists: jnp.ndarray, metric: str = "cosine") -> jnp.ndarray:
    """kNN-density score per sample (ref nn_utils.py:408-460 selection):
    mean distance to the k nearest neighbours; smaller = denser. For cosine
    similarities we convert to distance = 1 - sim."""
    if metric == "cosine":
        d = 1.0 - knn_dists
    else:
        d = jnp.sqrt(jnp.maximum(-knn_dists, 0.0))
    return jnp.mean(d, axis=1)


def select_representatives(
    feats: np.ndarray,
    assignments: np.ndarray,
    density: np.ndarray,
    num_clusters: int,
) -> np.ndarray:
    """Pick the densest sample of each cluster (the first, unregularized
    iteration of USL selection; see select_representatives_regularized for
    the full protocol)."""
    reps = np.full(num_clusters, -1, np.int64)
    for c in range(num_clusters):
        members = np.nonzero(assignments == c)[0]
        if len(members):
            reps[c] = members[np.argmin(density[members])]
    return reps


@functools.partial(
    jax.jit, static_argnames=("horizon", "exclude_same_cluster", "chunk")
)
def _selection_regularizer(
    feats: jnp.ndarray,          # (N, D)
    selected: jnp.ndarray,       # (S, D) features of the current selection
    sel_src: jnp.ndarray,        # (S,) original index of each selected row
    labels: jnp.ndarray,         # (N,) cluster label per sample
    alpha: float,
    horizon: int,
    exclude_same_cluster: bool,
    chunk: int = 2048,
) -> jnp.ndarray:
    """sum_{j in horizon nearest selected} 1 / d2(x, s_j)^alpha, with the
    reference's exclusion rules (nn_utils_imagenet.py:154-210): either
    distance-to-oneself (the reference's d2 == 0 check, which we express
    robustly as selected-source-index == row-index since matmul-form f32
    distances are not exactly zero) or entries whose selected-slot index
    equals the sample's own cluster label are pushed to 1e10 before the
    sum."""
    n, d = feats.shape
    s = selected.shape[0]
    k = min(horizon, s)
    sel_sq = jnp.sum(selected * selected, axis=-1)

    num_chunks = (n + chunk - 1) // chunk
    pad_n = num_chunks * chunk
    fp = jnp.pad(feats, ((0, pad_n - n), (0, 0)))
    lp = jnp.pad(labels, (0, pad_n - n))

    def body(i, reg):
        rows = jax.lax.dynamic_slice(fp, (i * chunk, 0), (chunk, d))
        lab = jax.lax.dynamic_slice(lp, (i * chunk,), (chunk,))
        row_ids = i * chunk + jnp.arange(chunk)
        d2 = (
            jnp.sum(rows * rows, -1)[:, None]
            - 2 * rows @ selected.T
            + sel_sq[None, :]
        )
        d2 = jnp.maximum(d2, 0.0)
        negd, idx = jax.lax.top_k(-d2, k)    # k smallest distances + slots
        dmin = -negd
        if exclude_same_cluster:
            # a selected slot whose index equals the sample's own cluster
            # label is its own-cluster representative: ignored
            dmin = jnp.where(idx == lab[:, None], 1e10, dmin)
        else:
            is_self = sel_src[idx] == row_ids[:, None]
            dmin = jnp.where(is_self | (dmin == 0.0), 1e10, dmin)
        r = jnp.sum(1.0 / jnp.power(dmin, alpha), axis=1)
        return jax.lax.dynamic_update_slice(reg, r, (i * chunk,))

    reg = jnp.zeros((pad_n,), feats.dtype)
    reg = jax.lax.fori_loop(0, num_chunks, body, reg)
    return reg[:n]


def select_representatives_regularized(
    feats: np.ndarray,           # (N, D)
    assignments: np.ndarray,     # (N,) cluster label per sample
    neighbors_dist: np.ndarray,  # (N,) mean kNN distance (density measure)
    num_clusters: int,
    final_sample_num: Optional[int] = None,
    iters: int = 2,
    w: float = 0.05,
    momentum: float = 0.0,
    horizon_num: int = 32,
    alpha: float = 1.0,
    exclude_same_cluster: bool = True,
) -> np.ndarray:
    """Iterative kNN-regularized representative selection — the full USL
    protocol (ref ``nn_utils_imagenet.py:105-213``
    get_selection_with_reg_imagenet; u2seg config
    ``ImageNet_usl_dino_0.2.yaml``: NITERS=2, W=0.05, MOMENTUM=0.0,
    HORIZON_NUM=32, ALPHA=1.0, EXCLUDE_SAME_CLUSTER=True).

    Per iteration, for each cluster in index order pick
    argmax(1/neighbors_dist - w * regularizer) among members (stopping at
    ``final_sample_num``); between iterations the regularizer accumulates
    inverse squared distances to the ``horizon_num`` nearest currently
    selected representatives (distance matmuls on device, greedy on host).
    Mirrors the reference quirk of comparing selected-slot *positions* to
    cluster labels in the exclusion mask.

    Returns the selected indices of the LAST iteration (-1 for clusters
    with no members, filtered out).
    """
    assignments = np.asarray(assignments)
    neighbors_dist = np.asarray(neighbors_dist, np.float64)
    if final_sample_num is None:
        final_sample_num = num_clusters
    regularizer = np.zeros(len(feats), np.float64)
    members_by_cluster = [
        np.nonzero(assignments == c)[0] for c in range(num_clusters)
    ]
    selected: list = []
    for it in range(iters):
        selected = []
        for c in range(num_clusters):
            if len(selected) == final_sample_num:
                break
            members = members_by_cluster[c]
            if len(members) == 0:
                continue
            scores = 1.0 / neighbors_dist[members] - w * regularizer[members]
            selected.append(int(members[np.argmax(scores)]))
        if it < iters - 1 and selected:
            new_reg = np.asarray(_selection_regularizer(
                jnp.asarray(feats, jnp.float32),
                jnp.asarray(np.asarray(feats)[selected], jnp.float32),
                jnp.asarray(selected, jnp.int32),
                jnp.asarray(assignments, jnp.int32),
                alpha, horizon_num, exclude_same_cluster,
            ), np.float64)
            regularizer = regularizer * momentum + new_reg * (1 - momentum)
    return np.asarray(selected, np.int64)
