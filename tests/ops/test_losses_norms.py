"""Regression tests for softmax_ce non-finite robustness and folded-BN
train/eval dtype parity (advisor findings, round 1)."""
import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.losses import softmax_ce
from u2seg_tpu.ops.norms import get_norm


def test_softmax_ce_ignores_nonfinite_unselected_logit():
    # -inf in a masked-out class must not poison the row via inf * 0
    logits = jnp.array([[2.0, -jnp.inf, 1.0], [0.5, 0.0, -1.0]])
    labels = jnp.array([0, 2])
    out = softmax_ce(logits, labels)
    assert np.isfinite(np.asarray(out)).all()
    # row 0: logsumexp over (2, -inf, 1) == logsumexp(2, 1); label logit 2
    exp0 = np.logaddexp(2.0, 1.0) - 2.0
    np.testing.assert_allclose(float(out[0]), exp0, rtol=1e-6)


def test_softmax_ce_matches_gather_on_finite_logits(rng):
    logits = jnp.array(rng.randn(8, 11).astype(np.float32))
    labels = jnp.array(rng.randint(0, 11, 8))
    out = softmax_ce(logits, labels)
    ref = jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
        logits, labels[:, None], axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_folded_bn_eval_dtype_matches_train_promotion(rng):
    # dtype=None means flax's "promote to f32": the folded eval path must
    # not silently emit bf16 where training emits f32
    bn = get_norm("BN", 8)
    x = jnp.array(rng.randn(2, 4, 4, 8).astype(np.float32)).astype(jnp.bfloat16)
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x, use_running_average=False)
    y_train = bn.apply(variables, x, use_running_average=False,
                       mutable=["batch_stats"])[0]
    y_eval = bn.apply(variables, x, use_running_average=True)
    assert y_eval.dtype == y_train.dtype == jnp.float32


def test_folded_bn_explicit_dtype_respected(rng):
    bn = get_norm("BN", 8, dtype=jnp.bfloat16)
    x = jnp.array(rng.randn(2, 4, 4, 8).astype(np.float32))
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x, use_running_average=False)
    y_eval = bn.apply(variables, x, use_running_average=True)
    assert y_eval.dtype == jnp.bfloat16
