"""USL-T: learned multi-head clustering over frozen features.

Counterpart of ``u2seg/Instance_Clustering/shared/utils/uslt_utils.py``
(ClusteringModel :266, local loss :18, global loss :68) and the
``usl-t-imagenet.py`` driver: several linear cluster heads over a frozen
backbone embedding, trained with (a) a local neighbour-consistency loss with
sharpened pseudo-labels and (b) a global entropy-balancing loss; selection
picks the most confident sample per cluster.
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class ClusteringHeads(nn.Module):
    """N independent linear cluster heads (ref uslt_utils.py:266-324)."""

    num_clusters: int
    num_heads: int = 3

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> Sequence[jnp.ndarray]:
        return [
            nn.Dense(self.num_clusters, name=f"head{i}")(feats)
            for i in range(self.num_heads)
        ]


def sharpen(p: jnp.ndarray, temperature: float = 0.5) -> jnp.ndarray:
    """Temperature sharpening of soft assignments (ref :18-40)."""
    q = p ** (1.0 / temperature)
    return q / jnp.sum(q, axis=-1, keepdims=True)


def local_consistency_loss(
    logits_anchor: jnp.ndarray,
    logits_neighbor: jnp.ndarray,
    temperature: float = 0.5,
    confidence_threshold: float = 0.0,
) -> jnp.ndarray:
    """Neighbour agreement: CE(sharpened stopgrad anchor || neighbor)
    (ref uslt_utils.py:18-66)."""
    p_anchor = jax.nn.softmax(logits_anchor, -1)
    target = sharpen(jax.lax.stop_gradient(p_anchor), temperature)
    logp = jax.nn.log_softmax(logits_neighbor, -1)
    ce = -jnp.sum(target * logp, axis=-1)
    if confidence_threshold > 0:
        conf = jnp.max(p_anchor, axis=-1)
        w = (conf > confidence_threshold).astype(ce.dtype)
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(ce)


def global_entropy_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Entropy balancing: maximize the entropy of the mean assignment so
    clusters stay used (ref uslt_utils.py:68-100). Returns -H(mean_p)."""
    p = jax.nn.softmax(logits, -1)
    mean_p = jnp.clip(jnp.mean(p, axis=0), 1e-8, 1.0)
    return jnp.sum(mean_p * jnp.log(mean_p))


def uslt_loss(
    head_logits_anchor: Sequence[jnp.ndarray],
    head_logits_neighbor: Sequence[jnp.ndarray],
    global_weight: float = 2.0,
    temperature: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    local = sum(
        local_consistency_loss(a, b, temperature)
        for a, b in zip(head_logits_anchor, head_logits_neighbor)
    ) / len(head_logits_anchor)
    glob = sum(
        global_entropy_loss(a) for a in head_logits_anchor
    ) / len(head_logits_anchor)
    total = local + global_weight * glob
    return total, {"loss_local": local, "loss_global": glob}


def make_uslt_train_step(model: ClusteringHeads, tx: optax.GradientTransformation):
    @jax.jit
    def step(params, opt_state, feats_anchor, feats_neighbor):
        def loss_fn(p):
            la = model.apply({"params": p}, feats_anchor)
            lb = model.apply({"params": p}, feats_neighbor)
            return uslt_loss(la, lb)

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = total
        return params, opt_state, metrics

    return step


def train_uslt(
    rng: jax.Array,
    feats: jnp.ndarray,
    neighbor_idx: jnp.ndarray,       # (N, K) kNN indices (from kmeans.knn)
    num_clusters: int,
    num_heads: int = 3,
    steps: int = 1000,
    batch_size: int = 1024,
    lr: float = 1e-3,
):
    """Train the clustering heads on precomputed features + kNN graph.
    Returns (model, params, assignments (N,), head_scores)."""
    model = ClusteringHeads(num_clusters, num_heads)
    params = model.init(rng, feats[:2])["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = make_uslt_train_step(model, tx)

    n = feats.shape[0]
    k = neighbor_idx.shape[1]
    for i in range(steps):
        rng, s1, s2 = jax.random.split(rng, 3)
        idx = jax.random.randint(s1, (min(batch_size, n),), 0, n)
        nbr_choice = jax.random.randint(s2, idx.shape, 0, k)
        nbr = neighbor_idx[idx, nbr_choice]
        params, opt_state, metrics = step(
            params, opt_state, feats[idx], feats[nbr]
        )
    logits = model.apply({"params": params}, feats)
    # pick the head with the most confident (lowest-entropy) assignments
    def head_entropy(l):
        p = jax.nn.softmax(l, -1)
        return float(jnp.mean(-jnp.sum(p * jnp.log(jnp.clip(p, 1e-8, 1)), -1)))

    entropies = [head_entropy(l) for l in logits]
    best = int(jnp.argmin(jnp.asarray(entropies)))
    assignments = jnp.argmax(logits[best], axis=-1)
    return model, params, assignments, entropies
