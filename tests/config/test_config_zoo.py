"""Every yaml in configs/ loads, type-checks against the dataclass tree,
and builds its meta-architecture (ref pattern: tests/test_model_zoo.py +
quick_schedules configs used by the reference CI)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2seg_tpu.config.config import load_config
from u2seg_tpu.models.build import build_model

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "configs")
ALL_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"),
                         recursive=True)
    if not os.path.basename(p).startswith("Base-")
)


def test_zoo_is_nonempty():
    assert len(ALL_CONFIGS) >= 20


@pytest.mark.parametrize(
    "path", ALL_CONFIGS, ids=[os.path.relpath(p, CONFIG_ROOT).replace("/", ":")
                              for p in ALL_CONFIGS])
def test_config_loads_and_builds(path):
    cfg = load_config(path)
    model = build_model(cfg)
    assert model is not None
    # model-level task flags propagate to the heads (single MASK_ON /
    # KEYPOINT_ON source of truth, ref defaults.py:33,36)
    assert cfg.model.roi_heads.mask_on == cfg.model.mask_on
    assert cfg.model.roi_heads.keypoint_on == cfg.model.keypoint_on


# one init per meta-architecture family (R50 only; R101 is the same code
# path with more blocks and would slow the fast tier for no extra signal)
_INIT_CASES = [
    "COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml",
    "COCO-Detection/retinanet_R_50_FPN_1x.yaml",
    "COCO-Detection/fcos_R_50_FPN_1x.yaml",
    "COCO-Detection/rpn_R_50_FPN_1x.yaml",
    "COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.yaml",
    "Misc/semantic_R_50_FPN_1x.yaml",
]


@pytest.mark.slow
@pytest.mark.parametrize("rel", _INIT_CASES, ids=[c.replace("/", ":")
                                                  for c in _INIT_CASES])
def test_zoo_model_initializes(rel):
    cfg = load_config(os.path.join(CONFIG_ROOT, rel))
    model = build_model(cfg)
    h = w = 64
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[h, w]], jnp.int32)
    name = cfg.model.meta_architecture
    variables = model.init({"params": jax.random.PRNGKey(0)}, images,
                           sizes, train=False)
    out = model.apply(variables, images, sizes, train=False)
    if name == "SemanticSegmentor":
        assert np.isfinite(np.asarray(out)).all()
    else:
        # detections: boxes finite everywhere; scores finite on valid rows
        # (padding rows carry -inf sentinels by design)
        assert np.isfinite(np.asarray(out.boxes)).all()
        valid = np.asarray(out.valid)
        scores = np.asarray(out.scores)
        assert np.isfinite(scores[valid]).all()


def test_model_zoo_api():
    from u2seg_tpu import model_zoo

    path = model_zoo.get_config_file(
        "COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml")
    assert os.path.isfile(path)
    cfg = model_zoo.get_config("COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml")
    assert cfg.model.meta_architecture == "GeneralizedRCNN"
    assert cfg.model.weights == ""
    model, cfg2 = model_zoo.get(
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
    assert model is not None and cfg2.model.mask_on
    zoo = model_zoo.list_configs()
    assert "COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.yaml" in zoo
    with pytest.raises(RuntimeError):
        model_zoo.get_config_file("nope/nothing.yaml")
