"""FixMatch / SimCLRv2 fine-tune semi-sup extras."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from u2seg_tpu.pseudo.semisup import (
    FixMatchConfig, ema_update, fixmatch_losses, make_finetune_train_step,
    make_fixmatch_train_step, randaugment_mc,
)


def test_fixmatch_loss_semantics():
    rng = np.random.RandomState(0)
    c = 10
    cfg = FixMatchConfig(threshold=0.95, temperature=1.0, lambda_u=1.0)
    logits_x = jnp.asarray(rng.randn(4, c), jnp.float32)
    targets = jnp.asarray([1, 2, 3, 4], jnp.int32)

    # confident weak logits -> mask 1; diffuse -> mask 0
    conf = jnp.full((6, c), -10.0).at[:, 3].set(10.0)
    diffuse = jnp.zeros((6, c))
    strong = jnp.asarray(rng.randn(6, c), jnp.float32)

    l_conf = fixmatch_losses(logits_x, targets, conf, strong, cfg)
    assert float(l_conf["mask_rate"]) == 1.0
    # Lu == mean CE of strong vs class 3
    want = -np.mean(np.asarray(
        jax.nn.log_softmax(strong, -1))[:, 3])
    np.testing.assert_allclose(float(l_conf["loss_u"]), want, rtol=1e-5)

    l_diff = fixmatch_losses(logits_x, targets, diffuse, strong, cfg)
    assert float(l_diff["mask_rate"]) == 0.0
    assert float(l_diff["loss_u"]) == 0.0
    # Lx equals plain CE either way
    np.testing.assert_allclose(float(l_diff["loss_x"]),
                               float(l_conf["loss_x"]), rtol=1e-6)

    # temperature sharpening can push a sub-threshold max prob over it
    mild = jnp.zeros((6, c)).at[:, 2].set(2.0)
    cold = FixMatchConfig(threshold=0.95, temperature=0.2)
    assert float(fixmatch_losses(logits_x, targets, mild, strong,
                                 cfg)["mask_rate"]) == 0.0
    assert float(fixmatch_losses(logits_x, targets, mild, strong,
                                 cold)["mask_rate"]) == 1.0


def test_ema_update():
    ema = {"w": jnp.ones((3,)) * 2.0}
    cur = {"w": jnp.zeros((3,))}
    out = ema_update(ema, cur, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.8, rtol=1e-6)


class _TinyNet(nn.Module):
    classes: int = 5

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.classes)(x)


def test_fixmatch_train_step_learns():
    """A few FixMatch steps on separable data: loss_x drops, EMA moves."""
    rng = np.random.RandomState(0)
    net = _TinyNet()
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    params = net.init(key, img)["params"]

    opt = optax.sgd(0.5, momentum=0.9)
    cfg = FixMatchConfig(ema_decay=0.5)
    step = make_fixmatch_train_step(
        lambda v, x, train: net.apply(v, x, train=train), opt, cfg)
    state = {
        "params": params,
        "ema_params": jax.tree_util.tree_map(jnp.copy, params),
        "opt_state": opt.init(params),
    }
    # class = brightness of the image; every step sees all 5 classes
    def batch(n_per):
        cls = np.tile(np.arange(5), n_per)
        x = rng.rand(len(cls), 16, 16, 3) * 0.2 + cls[:, None, None, None] / 5.0
        return jnp.asarray(x, jnp.float32), jnp.asarray(cls, jnp.int32)

    first = None
    for it in range(12):
        (xb, yb) = batch(1)
        (uw, _) = batch(2)
        (us, _) = batch(2)
        state, metrics = step(state, xb, yb, uw, us)
        if first is None:
            first = float(metrics["loss_x"])
    assert float(metrics["loss_x"]) < first
    # ema trails the live params (decay 0.5 over a dozen steps -> close
    # to, but not equal to, the current params)
    diff = jax.tree_util.tree_map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))),
        state["ema_params"], state["params"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0


def test_randaugment_mc_valid_output():
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    for seed in range(10):
        out = randaugment_mc(img, np.random.RandomState(seed))
        assert out.shape == img.shape and out.dtype == np.uint8
    # cutout present: at least one gray-ish square pixel patch
    out = randaugment_mc(img, np.random.RandomState(1))
    assert (out == 127).any()


def test_finetune_step_freeze_backbone():
    rng = np.random.RandomState(0)
    back = nn.Dense(8)
    head = nn.Dense(3)
    x = jnp.asarray(rng.rand(4, 6), jnp.float32)
    params = {
        "backbone": back.init(jax.random.PRNGKey(0), x),
        "head": head.init(jax.random.PRNGKey(1), jnp.zeros((4, 8))),
    }
    opt = optax.sgd(0.1)
    for freeze in (True, False):
        step = make_finetune_train_step(
            lambda p, im: back.apply(p, im),
            lambda p, f: head.apply(p, f), opt, freeze_backbone=freeze)
        state = {"params": jax.tree_util.tree_map(jnp.copy, params),
                 "opt_state": opt.init(params)}
        st, metrics = step(state, x, jnp.asarray([0, 1, 2, 0], jnp.int32))
        moved_back = float(jnp.max(jnp.abs(
            st["params"]["backbone"]["params"]["kernel"]
            - params["backbone"]["params"]["kernel"])))
        moved_head = float(jnp.max(jnp.abs(
            st["params"]["head"]["params"]["kernel"]
            - params["head"]["params"]["kernel"])))
        assert moved_head > 0.0
        assert (moved_back == 0.0) == freeze
        assert np.isfinite(float(metrics["loss"]))
