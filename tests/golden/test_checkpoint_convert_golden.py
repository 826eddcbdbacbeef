"""Checkpoint-converter golden test against a REAL detectron2 state dict.

``fixtures/d2_panoptic_fpn_state.npz`` holds the flat ``state_dict()`` of
the actual reference modules (R50-FPN SyncBN backbone, RPN head, 3-stage
cascade box heads, 800-class mask head, SemSegFPNHead) built from the
reference SOURCE (/root/reference) by ``dev/make_d2_state_dict.py`` with
per-key deterministic values. Unlike the synthetic round-trip test
(tests/engine/test_checkpoint_convert.py), a drift between the reference's
real key layout and the converter's assumptions fails HERE.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size flagship init (~1 min on CPU)

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "d2_panoptic_fpn_state.npz")


def flat_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            out.update(flat_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


@pytest.fixture(scope="module")
def converted(d2_state_path):
    from u2seg_tpu.engine.checkpoint import convert_d2_panoptic_fpn

    ref = dict(np.load(d2_state_path))
    params, stats = convert_d2_panoptic_fpn(ref, num_stages=3)
    return ref, params, stats


def test_all_reference_tensors_consumed(converted):
    ref, params, stats = converted
    n_ref = sum(1 for k in ref if not k.endswith("num_batches_tracked"))
    n_out = len(flat_paths(params)) + len(flat_paths(stats))
    assert n_out == n_ref, (n_out, n_ref)


def test_converted_tree_matches_model_init(converted):
    from u2seg_tpu.config.config import Config
    from u2seg_tpu.models.build import build_model

    _, params, stats = converted
    cfg = Config()  # the flagship: cascade, 800 classes, SyncBN
    model = build_model(cfg)
    h = w = 64
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, 3)), jnp.array([[h, w]], jnp.int32), train=False,
    )
    want_params = flat_paths(
        jax.tree_util.tree_map(lambda x: x.shape, dict(variables["params"]))
    )
    got_params = flat_paths(
        jax.tree_util.tree_map(lambda x: x.shape, params)
    )
    missing = sorted(set(want_params) - set(got_params))
    extra = sorted(set(got_params) - set(want_params))
    assert not missing, f"converter missed model params: {missing[:8]}"
    assert not extra, f"converter produced unknown params: {extra[:8]}"
    mismatched = [
        (k, got_params[k], want_params[k])
        for k in want_params if got_params[k] != tuple(want_params[k])
    ]
    assert not mismatched, f"shape mismatches: {mismatched[:8]}"

    want_stats = flat_paths(jax.tree_util.tree_map(
        lambda x: x.shape, dict(variables["batch_stats"])))
    got_stats = flat_paths(jax.tree_util.tree_map(lambda x: x.shape, stats))
    assert set(got_stats) == set(want_stats)


def test_value_layout_transposes(converted):
    ref, params, stats = converted
    # conv kernel OIHW -> HWIO
    w = ref["backbone.bottom_up.res2.0.conv1.weight"]
    k = np.asarray(params["backbone"]["bottom_up"]["res2_0"]["conv1"]["kernel"])
    np.testing.assert_array_equal(k, w.transpose(2, 3, 1, 0))
    # BN running stats land in batch_stats
    np.testing.assert_array_equal(
        np.asarray(stats["backbone"]["bottom_up"]["res2_0"]["BatchNorm_0"]["mean"]),
        ref["backbone.bottom_up.res2.0.conv1.norm.running_mean"],
    )
    # fc1 channel-order fix: torch flattens (C,7,7), ours (7,7,C)
    wfc = ref["roi_heads.box_head.0.fc1.weight"]          # (1024, 12544)
    o, i = wfc.shape
    c = i // 49
    want = wfc.reshape(o, c, 7, 7).transpose(0, 2, 3, 1).reshape(o, i).T
    np.testing.assert_array_equal(
        np.asarray(params["roi_heads"]["box_head0"]["fc1"]["kernel"]), want
    )
    # deconv IOHW -> HWIO(flipped? checked against flax ConvTranspose)
    assert np.asarray(
        params["roi_heads"]["mask_head"]["deconv"]["kernel"]
    ).shape[-1] == 256
    # sem-seg GN affine
    np.testing.assert_array_equal(
        np.asarray(params["sem_seg_head"]["p5_gn2"]["scale"]),
        ref["sem_seg_head.p5.4.norm.weight"],
    )
