import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)
import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.models.dense_detector import (
    FCOS, FCOSConfig, RetinaNet, RetinaNetConfig,
)
from u2seg_tpu.structures.instances import GtInstances


def fake_fpn(rng, b=2, base=16, ch=32):
    feats = {}
    size = base
    for name in ["p3", "p4", "p5", "p6", "p7"]:
        feats[name] = jnp.array(rng.rand(b, size, size, ch).astype(np.float32))
        size //= 2
    return feats


def fake_gt(rng, b=2, g=3, img=128):
    xy = rng.rand(b, g, 2) * img / 2
    wh = rng.rand(b, g, 2) * img / 3 + 8
    return GtInstances(
        boxes=jnp.array(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        classes=jnp.array(rng.randint(0, 9, (b, g)).astype(np.int32)),
        valid=jnp.ones((b, g), bool),
    )


def test_retinanet_train_and_inference(rng):
    cfg = RetinaNetConfig(num_classes=9, topk_candidates=64, max_detections=8)
    model = RetinaNet(cfg)
    feats = fake_fpn(rng)
    sizes = jnp.array([[128, 128]] * 2, jnp.int32)
    gt = fake_gt(rng)
    v = model.init({"params": jax.random.PRNGKey(0)}, feats, sizes,
                   gt=gt, train=True)
    losses = model.apply(v, feats, sizes, gt=gt, train=True)
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    det = model.apply(v, feats, sizes, train=False)
    assert det.boxes.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_fcos_train_and_inference(rng):
    cfg = FCOSConfig(num_classes=9, topk_candidates=64, max_detections=8)
    model = FCOS(cfg)
    feats = fake_fpn(rng)
    sizes = jnp.array([[128, 128]] * 2, jnp.int32)
    gt = fake_gt(rng)
    v = model.init({"params": jax.random.PRNGKey(0)}, feats, sizes,
                   gt=gt, train=True)
    losses = model.apply(v, feats, sizes, gt=gt, train=True)
    assert set(losses) == {"loss_fcos_cls", "loss_fcos_loc", "loss_fcos_ctr"}
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    det = model.apply(v, feats, sizes, train=False)
    assert det.boxes.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(det.scores)).all()
