"""build_backbone registry: every family builds from ModelConfig and
produces the FPN feature dict (ref modeling/backbone/build.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2seg_tpu.config.config import ModelConfig
from u2seg_tpu.models.backbone import build_backbone


def _forward(cfg: ModelConfig, h=64, w=64):
    bb = build_backbone(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, h, w, 3), jnp.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return bb.apply(variables, x, train=False), (h, w)


def _tiny_model_cfg(**bb_kwargs):
    cfg = ModelConfig()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, **bb_kwargs))
    return cfg


def _check_pyramid(out, h, w, levels=("p2", "p3", "p4", "p5", "p6")):
    from u2seg_tpu.models.fpn import FPN_STRIDES

    for lvl in levels:
        assert lvl in out, sorted(out)
        s = FPN_STRIDES[lvl]
        assert out[lvl].shape[1:3] == (h // s, w // s), (lvl, out[lvl].shape)
        assert np.isfinite(np.asarray(out[lvl], jnp.float32)).all()


def test_resnet_fpn_default():
    out, (h, w) = _forward(_tiny_model_cfg(name="ResNetFPN"))
    _check_pyramid(out, h, w)


@pytest.mark.slow
def test_vitdet():
    cfg = _tiny_model_cfg(name="ViTDet", vit_dim=96, vit_depth=2,
                          vit_num_heads=3, vit_window_size=2,
                          vit_global_blocks=(1,))
    out, (h, w) = _forward(cfg)
    _check_pyramid(out, h, w)


@pytest.mark.slow
def test_swin_fpn():
    # 64 is 32-divisible (the loader's pad buckets guarantee this) and every
    # stage size (16, 8, 4, 2) divides window_size=2.
    cfg = _tiny_model_cfg(name="SwinFPN", embed_dim=24, window_size=2,
                          depths=(1, 1, 1, 1), trunk_num_heads=(1, 2, 3, 4))
    out, (h, w) = _forward(cfg)
    _check_pyramid(out, h, w)


@pytest.mark.slow
def test_mvit_fpn():
    cfg = _tiny_model_cfg(name="MViTFPN", embed_dim=24,
                          depths=(1, 1, 1, 1), trunk_num_heads=(1, 1, 2, 2))
    out, (h, w) = _forward(cfg)
    _check_pyramid(out, h, w)


@pytest.mark.slow
def test_regnet_fpn():
    # (w_a=24, w_0=16, w_m=2.0, depth=6) generates exactly 4 stages
    # (res2..res5), the minimum the p2..p6 FPN needs.
    cfg = _tiny_model_cfg(name="RegNetFPN", regnet_w_a=24.0, regnet_w_0=16,
                          regnet_w_m=2.0, regnet_depth=6,
                          regnet_group_width=8)
    out, (h, w) = _forward(cfg)
    _check_pyramid(out, h, w)


def test_unknown_backbone_raises():
    with pytest.raises(KeyError):
        build_backbone(_tiny_model_cfg(name="NoSuchBackbone"))
