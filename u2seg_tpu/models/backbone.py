"""Backbone registry & builder.

Counterpart of ``detectron2/modeling/backbone/build.py`` (BACKBONE_REGISTRY
+ build_backbone keyed on ``MODEL.BACKBONE.NAME``) and the per-family
``build_*_backbone`` wrappers (``fpn.py:225`` build_resnet_fpn_backbone,
``swin.py``/``mvit.py``/``regnet.py`` FPN assemblies, ViTDet's
``SimpleFeaturePyramid``). Every builder takes the full ModelConfig and
returns a Flax module mapping images -> {"p2".."p6"(+"p7")} NHWC features.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

BACKBONE_REGISTRY: Dict[str, Callable] = {}


def register_backbone(name: str):
    def deco(fn):
        BACKBONE_REGISTRY[name] = fn
        return fn

    return deco


def build_backbone(model_cfg, dtype: Any = jnp.float32,
                   name: str = "backbone") -> nn.Module:
    """model config -> backbone module (``model_cfg.backbone.name``)."""
    bb = getattr(model_cfg, "backbone", None)
    bname = bb.name if bb is not None else "ResNetFPN"
    if bname not in BACKBONE_REGISTRY:
        _register_builtin()
    if bname not in BACKBONE_REGISTRY:
        raise KeyError(f"Unknown backbone: {bname}")
    return BACKBONE_REGISTRY[bname](model_cfg, dtype, name)


class TrunkFPN(nn.Module):
    """Generic trunk (res2..res5 dict) + FPN assembly — the pattern the
    reference repeats per family (build_retinanet_swin_fpn_backbone etc.)."""

    trunk: nn.Module
    fpn_cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        from u2seg_tpu.models.fpn import FPN

        bottom_up = self.trunk(x, train=train)
        return FPN(self.fpn_cfg, dtype=self.dtype, name="fpn")(
            bottom_up, train=train)


def _register_builtin():
    from u2seg_tpu.models.fpn import ResNetFPN
    from u2seg_tpu.models.mvit import MViT
    from u2seg_tpu.models.regnet import RegNet
    from u2seg_tpu.models.swin import SwinTransformer
    from u2seg_tpu.models.vit import ViT, ViTDet

    @register_backbone("ResNetFPN")
    def _resnet(c, dtype, name):
        return ResNetFPN(c.resnet, c.fpn, dtype=dtype, name=name)

    @register_backbone("ViTDet")
    def _vitdet(c, dtype, name):
        b = c.backbone
        trunk = ViT(
            patch_size=b.vit_patch_size, dim=b.vit_dim, depth=b.vit_depth,
            num_heads=b.vit_num_heads, window_size=b.vit_window_size,
            global_blocks=tuple(b.vit_global_blocks),
        )
        return ViTDet(trunk, out_channels=c.fpn.out_channels, name=name)

    @register_backbone("SwinFPN")
    def _swin(c, dtype, name):
        b = c.backbone
        trunk = SwinTransformer(
            embed_dim=b.embed_dim, depths=tuple(b.depths),
            num_heads=tuple(b.trunk_num_heads), window_size=b.window_size,
        )
        return TrunkFPN(trunk, c.fpn, dtype=dtype, name=name)

    @register_backbone("MViTFPN")
    def _mvit(c, dtype, name):
        b = c.backbone
        trunk = MViT(
            embed_dim=b.embed_dim, depths=tuple(b.depths),
            num_heads=tuple(b.trunk_num_heads),
        )
        return TrunkFPN(trunk, c.fpn, dtype=dtype, name=name)

    @register_backbone("RegNetFPN")
    def _regnet(c, dtype, name):
        b = c.backbone
        trunk = RegNet(
            w_a=b.regnet_w_a, w_0=b.regnet_w_0, w_m=b.regnet_w_m,
            depth=b.regnet_depth, group_width=b.regnet_group_width,
            norm=c.resnet.norm,
        )
        return TrunkFPN(trunk, c.fpn, dtype=dtype, name=name)
