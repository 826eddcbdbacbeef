"""Per-param optimizer group tests (ref solver/build.py:119-253)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from u2seg_tpu.config.config import SolverConfig
from u2seg_tpu.solver import build_optimizer, param_group_labels


def _params():
    # flax-shaped tree: conv (kernel+bias), norm (scale+bias), dense kernel
    return {
        "backbone": {
            "conv1": {"kernel": jnp.ones((3, 3, 4, 4)), "bias": jnp.ones((4,))},
            "bn1": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
        },
        "head": {"fc": {"kernel": jnp.ones((4, 2))}},
    }


def test_labels():
    labels = param_group_labels(_params())
    assert labels["backbone"]["conv1"]["kernel"] == "regular"
    assert labels["backbone"]["conv1"]["bias"] == "bias"
    assert labels["backbone"]["bn1"]["scale"] == "norm"
    assert labels["backbone"]["bn1"]["bias"] == "norm"
    assert labels["head"]["fc"]["kernel"] == "regular"


def _one_step(cfg, params):
    tx = build_optimizer(cfg)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    return updates


def test_norm_params_exempt_from_weight_decay():
    cfg = SolverConfig(
        base_lr=1.0, warmup_iters=0, warmup_factor=1.0, momentum=0.0, clip_gradients=False,
        weight_decay=0.1, weight_decay_norm=0.0,
    )
    params = _params()
    upd = _one_step(cfg, params)
    # zero grads: update = -lr * wd * w for decayed groups, 0 for norm
    np.testing.assert_allclose(
        np.asarray(upd["backbone"]["conv1"]["kernel"]), -0.1, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(upd["backbone"]["conv1"]["bias"]), -0.1, atol=1e-6
    )
    assert np.all(np.asarray(upd["backbone"]["bn1"]["scale"]) == 0.0)
    assert np.all(np.asarray(upd["backbone"]["bn1"]["bias"]) == 0.0)


def test_bias_lr_factor_and_bias_decay():
    cfg = SolverConfig(
        base_lr=1.0, warmup_iters=0, warmup_factor=1.0, momentum=0.0, clip_gradients=False,
        weight_decay=0.1, weight_decay_norm=0.0, weight_decay_bias=0.2,
        bias_lr_factor=2.0,
    )
    upd = _one_step(cfg, _params())
    # conv bias: -lr * wd_bias * w * bias_lr_factor = -0.4
    np.testing.assert_allclose(
        np.asarray(upd["backbone"]["conv1"]["bias"]), -0.4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(upd["backbone"]["conv1"]["kernel"]), -0.1, atol=1e-6
    )
    # norm bias stays a norm param (module check wins, as in the reference
    # when no bias override is configured... here bias overrides ARE set,
    # but the reference applies overrides keyed on the param NAME after the
    # isinstance check, so a norm bias would get them too -- EXCEPT the
    # u2seg recipe never sets them. We follow module-wins semantics.)
    assert np.all(np.asarray(upd["backbone"]["bn1"]["bias"]) == 0.0)


def test_uniform_decay_fast_path():
    cfg = SolverConfig(
        base_lr=1.0, warmup_iters=0, warmup_factor=1.0, momentum=0.0, clip_gradients=False,
        weight_decay=0.1, weight_decay_norm=0.1, weight_decay_bias=0.1,
    )
    upd = _one_step(cfg, _params())
    for leaf in jax.tree_util.tree_leaves(upd):
        np.testing.assert_allclose(np.asarray(leaf), -0.1, atol=1e-6)


def test_real_model_labels():
    """The classifier must see norm params inside the real flagship model."""
    from u2seg_tpu.config.testing import tiny_spmd_config
    from u2seg_tpu.models.build import build_model

    cfg = tiny_spmd_config()
    model = build_model(cfg)
    h = w = 64
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, 3)), jnp.array([[h, w]], jnp.int32), train=False,
    )
    labels = param_group_labels(variables["params"])
    flat = jax.tree_util.tree_leaves(labels)
    assert "norm" in flat and "regular" in flat
