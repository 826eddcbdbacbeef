"""Checkpointing: orbax-backed save/restore + reference-format converters.

Counterpart of ``detectron2/checkpoint/`` (DetectionCheckpointer
detection_checkpoint.py:16; Caffe2/torchvision key alignment
c2_model_loading.py:209; ``last_checkpoint`` pointer convention) — TPU
rebuild: orbax sharded checkpoints for train state, plus a converter that
maps detectron2/torch ``.pkl``/``.pth`` PanopticFPN weights (including the
DINO-pretrained R50) onto our Flax parameter tree for checkpoint-parity
evaluation.
"""
from __future__ import annotations

import logging
import os
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

LAST_CHECKPOINT = "last_checkpoint"


class Checkpointer:
    """Periodic save / resume_or_load with a ``last_checkpoint`` pointer."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.abspath(os.path.join(self.output_dir, name))

    def save(self, name: str, state: Any) -> str:
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.output_dir, LAST_CHECKPOINT), "w") as f:
            f.write(name)
        logger.info("Saved checkpoint to %s", path)
        return path

    def load(self, name: str, target: Any) -> Any:
        path = self._path(name)
        restored = self._ckptr.restore(path, target)
        logger.info("Loaded checkpoint from %s", path)
        return restored

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.output_dir, LAST_CHECKPOINT))

    def get_checkpoint_file(self) -> Optional[str]:
        p = os.path.join(self.output_dir, LAST_CHECKPOINT)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def resume_or_load(self, target: Any, resume: bool = True) -> Tuple[Any, bool]:
        """(state, resumed). Like ref resume_or_load (defaults.py:401)."""
        if resume and self.has_checkpoint():
            name = self.get_checkpoint_file()
            return self.load(name, target), True
        return target, False


# ---------------------------------------------------------------------------
# Reference-weight conversion (.pkl / .pth torch PanopticFPN -> Flax tree)
# ---------------------------------------------------------------------------

def load_reference_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a detectron2 ``.pkl`` (numpy dict, ``__author__`` d2/Caffe2) or a
    torch ``.pth`` checkpoint into a flat name->array dict."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        model = data.get("model", data)
        return {k: np.asarray(v) for k, v in model.items()
                if isinstance(v, np.ndarray) or hasattr(v, "shape")}
    # torch .pth
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    model = data.get("model", data.get("state_dict", data))
    return {k: v.detach().cpu().numpy() for k, v in model.items()
            if hasattr(v, "detach")}


def _conv_t2f(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, H, W) -> flax (H, W, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_t2f(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, H, W) -> flax ConvTranspose (H, W, I, O).

    torch's ConvTranspose2d is the gradient of conv (kernel applied
    spatially flipped); flax's ConvTranspose applies the kernel unflipped
    (lax.conv_transpose, transpose_kernel=False), so the spatial axes must
    be reversed — caught by the activation-parity golden
    (tests/golden/test_activation_parity.py: 2x2 deconv blocks came out
    mirrored before the flip)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def _fc_t2f(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax Dense (I, O)."""
    return w.T


def convert_d2_panoptic_fpn(
    ref: Dict[str, np.ndarray],
    num_stages: int = 3,
    spatial_fc_transpose: Optional[Dict[str, Tuple[int, int, int]]] = None,
) -> Tuple[Dict, Dict]:
    """Map a detectron2 PanopticFPN state dict onto our parameter/batch-stats
    trees. Returns (params, batch_stats) as nested dicts matching
    ``models.panoptic_fpn.PanopticFPN``.

    Handles: ResNet stem/stages (torchvision block naming res{2..5}.{i}),
    FPN laterals/outputs, RPN head, cascade box heads/predictors, mask head,
    sem-seg head. BN layers (SyncBN in the reference) map weight/bias ->
    scale/bias params and running_mean/var -> batch_stats.

    Unmatched reference keys are logged (like the reference's non-strict
    load, c2_model_loading.py:209).
    """
    params: Dict = {}
    stats: Dict = {}
    used = set()

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def take(key):
        used.add(key)
        return ref[key]

    def conv(dst_path, src, transpose=True):
        if src + ".weight" in ref:
            w = take(src + ".weight")
            put(params, dst_path + ("kernel",), _conv_t2f(w) if transpose else w)
        if src + ".bias" in ref:
            put(params, dst_path + ("bias",), take(src + ".bias"))

    def bn(dst_scope, src):
        """dst_scope: path tuple of the BatchNorm module."""
        if src + ".weight" not in ref:
            return False
        put(params, dst_scope + ("scale",), take(src + ".weight"))
        put(params, dst_scope + ("bias",), take(src + ".bias"))
        put(stats, dst_scope + ("mean",), take(src + ".running_mean"))
        put(stats, dst_scope + ("var",), take(src + ".running_var"))
        return True

    B = ("backbone", "bottom_up")

    # stem
    conv(B + ("stem", "conv1"), "backbone.bottom_up.stem.conv1")
    bn(B + ("stem", "BatchNorm_0"), "backbone.bottom_up.stem.conv1.norm")

    # residual stages
    stage_blocks = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}
    for stage, nb in stage_blocks.items():
        for i in range(nb):
            src_base = f"backbone.bottom_up.{stage}.{i}"
            dst_base = B + (f"{stage}_{i}",)
            for ci, cname in enumerate(["conv1", "conv2", "conv3"]):
                conv(dst_base + (cname,), f"{src_base}.{cname}")
                bn(dst_base + (f"BatchNorm_{ci}",), f"{src_base}.{cname}.norm")
            if f"{src_base}.shortcut.weight" in ref:
                conv(dst_base + ("shortcut",), f"{src_base}.shortcut")
                bn(dst_base + ("BatchNorm_3",), f"{src_base}.shortcut.norm")

    # FPN
    lateral_map = {"res2": "fpn_lateral2", "res3": "fpn_lateral3",
                   "res4": "fpn_lateral4", "res5": "fpn_lateral5"}
    output_map = {"res2": "fpn_output2", "res3": "fpn_output3",
                  "res4": "fpn_output4", "res5": "fpn_output5"}
    # our FPN builds laterals coarse->fine; BatchNorm counters follow build
    # order: res5 lateral=BN_0 output=BN_1, res4 lateral=BN_2 output=BN_3...
    bn_idx = 0
    for stage in ["res5", "res4", "res3", "res2"]:
        conv(("backbone", "fpn", f"lateral_{stage}"),
             f"backbone.{lateral_map[stage]}")
        if bn(("backbone", "fpn", f"BatchNorm_{bn_idx}"),
              f"backbone.{lateral_map[stage]}.norm"):
            bn_idx += 1
        conv(("backbone", "fpn", f"output_{stage}"),
             f"backbone.{output_map[stage]}")
        if bn(("backbone", "fpn", f"BatchNorm_{bn_idx}"),
              f"backbone.{output_map[stage]}.norm"):
            bn_idx += 1

    # RPN head
    conv(("proposal_generator", "head", "conv0"), "proposal_generator.rpn_head.conv")
    conv(("proposal_generator", "head", "objectness_logits"),
         "proposal_generator.rpn_head.objectness_logits")
    conv(("proposal_generator", "head", "anchor_deltas"),
         "proposal_generator.rpn_head.anchor_deltas")

    # box heads (cascade: box_head.{k}, box_predictor.{k}; standard: no index)
    for k in range(num_stages):
        src_head = (f"roi_heads.box_head.{k}" if num_stages > 1
                    else "roi_heads.box_head")
        dst_head = ("roi_heads", f"box_head{k}" if num_stages > 1 else "box_head")
        for fc in (1, 2):
            if f"{src_head}.fc{fc}.weight" in ref:
                w = take(f"{src_head}.fc{fc}.weight")
                if fc == 1:
                    # torch flattens NCHW (C,7,7) -> our flatten is NHWC (7,7,C)
                    o, i = w.shape
                    c = i // 49
                    w = w.reshape(o, c, 7, 7).transpose(0, 2, 3, 1).reshape(o, i)
                put(params, dst_head + (f"fc{fc}", "kernel"), _fc_t2f(w))
                put(params, dst_head + (f"fc{fc}", "bias"),
                    take(f"{src_head}.fc{fc}.bias"))
        src_pred = (f"roi_heads.box_predictor.{k}" if num_stages > 1
                    else "roi_heads.box_predictor")
        dst_pred = ("roi_heads",
                    f"box_predictor{k}" if num_stages > 1 else "box_predictor")
        for name in ("cls_score", "bbox_pred"):
            if f"{src_pred}.{name}.weight" in ref:
                put(params, dst_pred + (name, "kernel"),
                    _fc_t2f(take(f"{src_pred}.{name}.weight")))
                put(params, dst_pred + (name, "bias"),
                    take(f"{src_pred}.{name}.bias"))

    # mask head
    for i in range(1, 5):
        conv(("roi_heads", "mask_head", f"mask_fcn{i}"),
             f"roi_heads.mask_head.mask_fcn{i}")
    if "roi_heads.mask_head.deconv.weight" in ref:
        put(params, ("roi_heads", "mask_head", "deconv", "kernel"),
            _deconv_t2f(take("roi_heads.mask_head.deconv.weight")))
        put(params, ("roi_heads", "mask_head", "deconv", "bias"),
            take("roi_heads.mask_head.deconv.bias"))
    conv(("roi_heads", "mask_head", "predictor"), "roi_heads.mask_head.predictor")

    # sem-seg head: d2 registers each scale head under the FEATURE name
    # (semantic_seg.py:220 add_module(in_feature, Sequential(...))), with
    # convs at even Sequential indices (conv, upsample, conv, upsample, ...)
    # and the GN affine inside the conv module's .norm. Verified against a
    # real state dict (tests/golden/fixtures/d2_panoptic_fpn_state.npz).
    for stage, head_len in [("p2", 1), ("p3", 1), ("p4", 2), ("p5", 3)]:
        for j in range(head_len):
            for cand in (f"sem_seg_head.{stage}.{2 * j}",
                         f"sem_seg_head.{stage}.{j}.0"):
                if cand + ".weight" in ref:
                    conv(("sem_seg_head", f"{stage}_conv{j}"), cand)
                    # GN affine
                    if cand + ".norm.weight" in ref:
                        put(params, ("sem_seg_head", f"{stage}_gn{j}", "scale"),
                            take(cand + ".norm.weight"))
                        put(params, ("sem_seg_head", f"{stage}_gn{j}", "bias"),
                            take(cand + ".norm.bias"))
                    break
    conv(("sem_seg_head", "predictor"), "sem_seg_head.predictor")

    unused = [k for k in ref if k not in used and not k.endswith("num_batches_tracked")]
    if unused:
        logger.info("Unmatched reference keys (%d): %s ...", len(unused), unused[:8])
    return params, stats
