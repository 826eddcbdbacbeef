"""Meta-architecture registry & build.

Counterpart of ``detectron2/modeling/meta_arch/build.py`` (build_model) and
the ``META_ARCH_REGISTRY`` pattern used throughout the reference. Kept thin:
idiomatic JAX favors explicit construction, but the registry preserves the
reference's extension surface (projects can register new meta-archs).
"""
from __future__ import annotations

from typing import Callable, Dict, Type

import flax.linen as nn

from u2seg_tpu.config.config import Config

META_ARCH_REGISTRY: Dict[str, Callable] = {}


def register_meta_arch(name: str):
    def deco(cls):
        META_ARCH_REGISTRY[name] = cls
        return cls

    return deco


def build_model(cfg: Config) -> nn.Module:
    """cfg -> uninitialized Flax module (params come from .init/.apply)."""
    name = cfg.model.meta_architecture
    if name not in META_ARCH_REGISTRY:
        _register_builtin()
    if name not in META_ARCH_REGISTRY:
        raise KeyError(f"Unknown meta architecture: {name}")
    return META_ARCH_REGISTRY[name](cfg.model)


def _register_builtin():
    from u2seg_tpu.models.dense_detector import FCOSDetector, RetinaNetDetector
    from u2seg_tpu.models.panoptic_fpn import PanopticFPN
    from u2seg_tpu.models.rcnn import (
        GeneralizedRCNN, ProposalNetwork, SemanticSegmentor,
    )

    META_ARCH_REGISTRY.setdefault("PanopticFPN", PanopticFPN)
    META_ARCH_REGISTRY.setdefault("GeneralizedRCNN", GeneralizedRCNN)
    META_ARCH_REGISTRY.setdefault("ProposalNetwork", ProposalNetwork)
    META_ARCH_REGISTRY.setdefault("SemanticSegmentor", SemanticSegmentor)
    META_ARCH_REGISTRY.setdefault("RetinaNet", RetinaNetDetector)
    META_ARCH_REGISTRY.setdefault("FCOS", FCOSDetector)
