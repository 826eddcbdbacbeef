import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.models.matcher import match
from u2seg_tpu.models.sampling import subsample_labels


def test_matcher_basic_thresholds():
    # quality rows = gt, cols = preds
    q = jnp.array([[0.8, 0.5, 0.2, 0.0],
                   [0.1, 0.65, 0.25, 0.0]])
    gt_valid = jnp.array([True, True])
    idx, labels = match(q, gt_valid, thresholds=(0.3, 0.7), labels=(0, -1, 1))
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(labels), [1, -1, 0, 0])


def test_matcher_low_quality_promotion():
    q = jnp.array([[0.8, 0.5, 0.2], [0.1, 0.2, 0.25]])
    gt_valid = jnp.array([True, True])
    _, labels = match(q, gt_valid, (0.3, 0.7), (0, -1, 1), allow_low_quality_matches=True)
    # pred 2 achieves gt1's max (0.25) -> promoted to positive
    np.testing.assert_array_equal(np.asarray(labels), [1, -1, 1])


def test_matcher_invalid_gt_ignored():
    q = jnp.array([[0.9, 0.9], [0.1, 0.2]])
    gt_valid = jnp.array([False, True])
    idx, labels = match(q, gt_valid, (0.3, 0.7), (0, -1, 1))
    np.testing.assert_array_equal(np.asarray(idx), [1, 1])
    np.testing.assert_array_equal(np.asarray(labels), [0, 0])


def test_matcher_no_valid_gt():
    q = jnp.zeros((2, 3))
    gt_valid = jnp.array([False, False])
    idx, labels = match(q, gt_valid, (0.3, 0.7), (0, -1, 1), allow_low_quality_matches=True)
    np.testing.assert_array_equal(np.asarray(labels), [0, 0, 0])


def test_subsample_respects_fractions():
    rng = jax.random.PRNGKey(0)
    labels = jnp.array([1] * 10 + [0] * 100 + [-1] * 20)
    idx, valid, is_pos = subsample_labels(rng, labels, 32, 0.25)
    assert int(valid.sum()) == 32
    assert int(is_pos.sum()) == 8  # min(8, 10)
    lab = np.asarray(labels)[np.asarray(idx)]
    assert (lab[np.asarray(is_pos)] == 1).all()
    neg_slots = np.asarray(valid) & ~np.asarray(is_pos)
    assert (lab[neg_slots] == 0).all()


def test_subsample_few_positives():
    rng = jax.random.PRNGKey(1)
    labels = jnp.array([1] * 2 + [0] * 100)
    idx, valid, is_pos = subsample_labels(rng, labels, 32, 0.5)
    assert int(is_pos.sum()) == 2
    assert int(valid.sum()) == 32  # negatives fill up


def test_subsample_few_negatives():
    rng = jax.random.PRNGKey(2)
    labels = jnp.array([1] * 50 + [0] * 3)
    idx, valid, is_pos = subsample_labels(rng, labels, 32, 0.25)
    assert int(is_pos.sum()) == 8
    assert int(valid.sum()) == 11  # 8 pos + 3 neg


def test_subsample_no_duplicates():
    rng = jax.random.PRNGKey(3)
    labels = jnp.array([1] * 20 + [0] * 40)
    idx, valid, _ = subsample_labels(rng, labels, 32, 0.25)
    chosen = np.asarray(idx)[np.asarray(valid)]
    assert len(set(chosen.tolist())) == len(chosen)
