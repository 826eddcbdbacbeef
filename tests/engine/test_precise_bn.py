import numpy as np
import jax.numpy as jnp

from u2seg_tpu.engine.precise_bn import estimate_bn_stats


def test_estimate_bn_stats_recovers_true_mean():
    """Feed synthetic per-batch moments through an EMA-updating apply_fn and
    check the estimator returns their exact average."""
    momentum = 0.9
    rng = np.random.RandomState(0)
    batch_moments = [
        {"mean": jnp.array(rng.randn(4).astype(np.float32)),
         "var": jnp.array(rng.rand(4).astype(np.float32) + 0.5)}
        for _ in range(10)
    ]
    it = iter(batch_moments)

    def apply_fn(params, stats, batch):
        m = next(it)
        return {
            "mean": momentum * stats["mean"] + (1 - momentum) * m["mean"],
            "var": momentum * stats["var"] + (1 - momentum) * m["var"],
        }

    init = {"mean": jnp.zeros(4), "var": jnp.ones(4)}
    out = estimate_bn_stats(apply_fn, None, init, range(10), num_iters=10,
                            momentum=momentum)
    true_mean = np.mean([np.asarray(m["mean"]) for m in batch_moments], 0)
    true_var = np.mean([np.asarray(m["var"]) for m in batch_moments], 0)
    np.testing.assert_allclose(np.asarray(out["mean"]), true_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["var"]), true_var, rtol=1e-5)


def test_estimate_bn_stats_no_batches():
    init = {"mean": jnp.ones(3)}
    out = estimate_bn_stats(lambda *a: None, None, init, [], num_iters=5)
    np.testing.assert_array_equal(np.asarray(out["mean"]), np.ones(3))
