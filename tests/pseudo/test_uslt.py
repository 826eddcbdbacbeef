import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.pseudo.kmeans import knn
from u2seg_tpu.pseudo.uslt import (
    ClusteringHeads, global_entropy_loss, local_consistency_loss, sharpen,
    train_uslt, uslt_loss,
)


def test_sharpen_increases_confidence():
    p = jnp.array([[0.6, 0.3, 0.1]])
    q = sharpen(p, temperature=0.5)
    assert float(q[0, 0]) > 0.6
    np.testing.assert_allclose(float(q.sum()), 1.0, rtol=1e-6)


def test_local_loss_zero_when_identical_confident():
    logits = jnp.array([[10.0, -10.0], [-10.0, 10.0]])
    loss = local_consistency_loss(logits, logits)
    assert float(loss) < 1e-3


def test_global_loss_prefers_balanced():
    balanced = jnp.array([[5.0, 0.0], [0.0, 5.0]])
    collapsed = jnp.array([[5.0, 0.0], [5.0, 0.0]])
    assert float(global_entropy_loss(balanced)) < float(
        global_entropy_loss(collapsed)
    )


def test_train_uslt_clusters_separable_data(rng):
    centers = rng.randn(3, 8).astype(np.float32) * 3
    feats = np.concatenate([
        centers[i] + rng.randn(40, 8).astype(np.float32) * 0.05
        for i in range(3)
    ])
    labels = np.repeat(np.arange(3), 40)
    f = jnp.array(feats)
    _, nbr = knn(f, k=5, metric="l2", chunk=32)
    model, params, assign, _ = train_uslt(
        jax.random.PRNGKey(0), f, np.asarray(nbr), num_clusters=3,
        steps=300, batch_size=64,
    )
    a = np.asarray(assign)
    purity = sum(
        np.bincount(labels[a == c]).max() for c in np.unique(a)
    ) / len(labels)
    assert purity > 0.9
