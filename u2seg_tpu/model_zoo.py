"""Model-zoo API: resolve zoo config paths and build models from them.

Counterpart of ``detectron2/model_zoo/model_zoo.py`` (get_checkpoint_url
:111, get_config_file :128, get_config :147, get :180). Differences by
design: checkpoints are local orbax/converted-torch files rather than a
release URL table (no model hosting here), so ``get`` loads weights from
``cfg.model.weights`` when it is set and ``trained=True``.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

from u2seg_tpu.config.config import Config, load_config

_CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


def get_config_file(config_path: str) -> str:
    """Zoo-relative path (e.g. ``COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml``)
    -> absolute path to the yaml in ``configs/``."""
    cfg_file = os.path.abspath(os.path.join(_CONFIG_ROOT, config_path))
    if not os.path.isfile(cfg_file):
        raise RuntimeError(f"{config_path} is not in the model zoo!")
    return cfg_file


def get_config(config_path: str, trained: bool = False) -> Config:
    """Load a zoo config. ``trained`` keeps ``model.weights`` as configured
    (a local checkpoint path); ``False`` clears it for from-scratch init."""
    import dataclasses

    cfg = load_config(get_config_file(config_path))
    if not trained:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, weights=""))
    return cfg


def get(config_path: str, trained: bool = False):
    """Build the zoo model (uninitialized Flax module + its config).

    Returns ``(model, cfg)``; parameters come from ``model.init`` or, when
    ``trained=True`` and ``cfg.model.weights`` points at a checkpoint, from
    ``u2seg_tpu.engine.checkpoint.load_checkpoint``.
    """
    from u2seg_tpu.models.build import build_model

    cfg = get_config(config_path, trained=trained)
    return build_model(cfg), cfg


def list_configs() -> Tuple[str, ...]:
    """All zoo-relative config paths (non-base yamls)."""
    import glob

    out = []
    for p in glob.glob(os.path.join(_CONFIG_ROOT, "**", "*.yaml"),
                       recursive=True):
        if os.path.basename(p).startswith("Base-"):
            continue
        out.append(os.path.relpath(p, _CONFIG_ROOT))
    return tuple(sorted(out))
