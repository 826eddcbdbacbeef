import os

import pytest

from u2seg_tpu.config.config import Config, load_config, save_config, to_dict

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")


def test_defaults_match_survey_parity_values():
    cfg = Config()
    # SURVEY.md §8 parity-critical values
    assert cfg.model.pixel_mean == (123.675, 116.280, 103.530)
    assert cfg.model.rpn.post_nms_topk_train == 4000
    assert cfg.model.rpn.nms_thresh == 0.65
    assert cfg.model.roi_heads.cascade_ious == (0.5, 0.6, 0.7)
    assert cfg.model.roi_heads.cls_agnostic_bbox_reg
    assert cfg.model.sem_seg_head.num_classes == 28
    assert cfg.model.sem_seg_head.loss_weight == 0.5
    assert cfg.model.panoptic.stuff_area_limit == 4096
    assert cfg.solver.steps == (210000, 250000)
    assert cfg.solver.gamma == 0.02


def test_load_yaml_with_base_inheritance():
    cfg = load_config(
        os.path.join(CONFIG_DIR, "COCO-PanopticSegmentation", "u2seg_R50_300.yaml")
    )
    # from u2seg_R50_300.yaml
    assert cfg.model.roi_heads.num_classes == 300
    assert cfg.datasets.cluster_num == 300
    # inherited through u2seg_R50_800.yaml
    assert cfg.model.rpn.nms_thresh == 0.65
    assert cfg.model.resnet.norm == "SyncBN"
    # inherited through Base-Panoptic-FPN.yaml
    assert cfg.solver.ims_per_batch == 16


def test_cli_overrides():
    cfg = load_config(None, ["solver.base_lr=0.02", "model.roi_heads.num_classes=42"])
    assert cfg.solver.base_lr == 0.02
    assert cfg.model.roi_heads.num_classes == 42


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(None, ["solver.not_a_key=1"])


def test_tuple_coercion():
    cfg = load_config(None, ["solver.steps=[100, 200]"])
    assert cfg.solver.steps == (100, 200)
    assert isinstance(cfg.solver.steps, tuple)


def test_save_roundtrip(tmp_path):
    cfg = load_config(None, ["solver.base_lr=0.5"])
    p = str(tmp_path / "cfg.yaml")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.solver.base_lr == 0.5
    assert to_dict(cfg2) == to_dict(cfg)
