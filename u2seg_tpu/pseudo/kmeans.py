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
    """Pick the densest sample of each cluster (the USL "selected samples";
    ref usl-imagenet.py:139-153 regularized selection, simplified to the
    density argmin which is its first iteration)."""
    reps = np.full(num_clusters, -1, np.int64)
    for c in range(num_clusters):
        members = np.nonzero(assignments == c)[0]
        if len(members):
            reps[c] = members[np.argmin(density[members])]
    return reps
