"""Full-inference glue goldens from ACTUAL reference execution.

Runs the reference's own inference-glue code (/root/reference/detectron2)
on small deterministic inputs and pins the outputs:

  A. ``find_top_rpn_proposals``  (proposal_utils.py:22) — per-level pre-NMS
     topk -> clip -> min-size filter -> per-level NMS -> cross-level topk.
  B. ``fast_rcnn_inference``     (roi_heads/fast_rcnn.py:46) — score
     threshold -> per-class NMS -> topk.
  C. ``paste_masks_in_image``    (layers/mask_ops.py:74).
  D. ``sem upsample + paste + combine_semantic_and_instance_outputs``
     (meta_arch/panoptic_fpn.py:184-269) — the full render/fusion chain.

torchvision's CUDA NMS is replaced by a 20-line O(n^2) pure-torch greedy
with identical semantics (score-descending, stable ties, offset trick for
batched). Everything else is the reference's own code.

Output: tests/golden/fixtures/glue_goldens.npz, consumed by
tests/golden/test_glue_parity.py. Run:
  python dev/make_glue_goldens.py        (needs /root/reference + torch-cpu)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_d2_state_dict import _module, install_stubs, load_ref  # noqa: E402

REF = "/root/reference/detectron2"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "fixtures", "glue_goldens.npz")


# ---------------------------------------------------------------------------
# Pure-torch greedy NMS (torchvision-semantics stand-in)
# ---------------------------------------------------------------------------

def _box_iou(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    area_a = (a[:, 2] - a[:, 0]).clamp(min=0) * (a[:, 3] - a[:, 1]).clamp(min=0)
    area_b = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return torch.where(union > 0, inter / union, torch.zeros_like(inter))


def nms_torch(boxes: torch.Tensor, scores: torch.Tensor,
              iou_threshold: float) -> torch.Tensor:
    """Exact greedy NMS, score-descending with stable ties (torchvision
    `nms` semantics)."""
    order = torch.argsort(-scores, stable=True)
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    keep = []
    for i_t in order:
        i = int(i_t)
        if suppressed[i]:
            continue
        keep.append(i)
        iou = _box_iou(boxes[i:i + 1], boxes)[0]
        suppressed |= iou > iou_threshold
        suppressed[i] = False
    return torch.tensor(keep, dtype=torch.int64)


def batched_nms_torch(boxes, scores, idxs, iou_threshold):
    """Offset trick (torchvision batched_nms / d2 layers/nms.py:20)."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + torch.tensor(1).to(boxes))
    return nms_torch(boxes + offsets[:, None], scores, iou_threshold)


# ---------------------------------------------------------------------------
# Load the reference glue with stubs
# ---------------------------------------------------------------------------

def load_glue():
    install_stubs()
    # real structures (pure torch)
    structures = sys.modules["detectron2.structures"]
    boxes_mod = load_ref("structures/boxes.py", "d2S.boxes")
    inst_mod = load_ref("structures/instances.py", "d2S.instances")
    structures.Boxes = boxes_mod.Boxes
    structures.Instances = inst_mod.Instances
    # layers the glue needs
    L = sys.modules.get("detectron2.layers") or _module("detectron2.layers")
    L.batched_nms = batched_nms_torch
    L.cat = lambda ts, dim=0: torch.cat(ts, dim) if len(ts) > 1 else ts[0]
    L.move_device_like = lambda src, dst: src
    L.nonzero_tuple = lambda x: x.nonzero(as_tuple=True)
    L.cross_entropy = torch.nn.functional.cross_entropy
    L.ciou_loss = None   # import surface only (box_regression losses)
    L.diou_loss = None
    from make_d2_state_dict import load_ref as _lr  # noqa: F401

    shape_spec = load_ref("layers/shape_spec.py", "d2L2.shape_spec")
    L.ShapeSpec = shape_spec.ShapeSpec

    prop_utils = load_ref("modeling/proposal_generator/proposal_utils.py",
                          "d2glue.proposal_utils")

    # fast_rcnn needs detectron2.modeling.box_regression
    import types

    d2mod = types.ModuleType("detectron2.modeling")
    d2mod.__path__ = []
    sys.modules["detectron2.modeling"] = d2mod
    box_reg = load_ref("modeling/box_regression.py", "d2glue.box_regression")
    sys.modules["detectron2.modeling.box_regression"] = box_reg
    d2mod.box_regression = box_reg
    fast_rcnn = load_ref("modeling/roi_heads/fast_rcnn.py", "d2glue.fast_rcnn")

    mask_ops = load_ref("layers/mask_ops.py", "d2glue.mask_ops")

    # panoptic_fpn: stub its meta-arch import surface, keep the fusion fn
    fake_post = _module("d2glue_post", detector_postprocess=None,
                        sem_seg_postprocess=None)
    sys.modules["d2m.postprocessing"] = fake_post
    from make_d2_state_dict import install_stubs as _  # noqa: F401
    import importlib.util

    # load as a flat module with its relative imports redirected
    src = open(os.path.join(REF, "modeling/meta_arch/panoptic_fpn.py")).read()
    src = src.replace("from ..postprocessing import", "from d2glue_post import")
    src = src.replace("from .build import META_ARCH_REGISTRY",
                      "from detectron2.utils.registry import Registry\n"
                      "META_ARCH_REGISTRY = Registry('M')")
    src = src.replace("from .rcnn import GeneralizedRCNN",
                      "GeneralizedRCNN = __import__('torch').nn.Module")
    src = src.replace("from .semantic_seg import build_sem_seg_head",
                      "build_sem_seg_head = None")
    pan_mod = types.ModuleType("d2glue.panoptic_fpn")
    sys.modules["d2glue.panoptic_fpn"] = pan_mod
    pan_mod.__dict__["__file__"] = "panoptic_fpn.py"
    exec(compile(src, "ref_panoptic_fpn.py", "exec"), pan_mod.__dict__)

    return prop_utils, fast_rcnn, mask_ops, pan_mod, structures


def main():
    prop_utils, fast_rcnn, mask_ops, pan_mod, structures = load_glue()
    Boxes, Instances = structures.Boxes, structures.Instances
    rs = np.random.RandomState(20260820)
    out = {}

    # ---- A. find_top_rpn_proposals -----------------------------------
    B, H, W = 2, 96, 128
    level_sizes = [200, 120, 60, 24]
    proposals, logits = [], []
    for nl in level_sizes:
        cx = rs.uniform(0, W, (B, nl))
        cy = rs.uniform(0, H, (B, nl))
        bw = rs.uniform(0, 60, (B, nl))
        bh = rs.uniform(0, 60, (B, nl))
        # include duplicates (NMS ties) and degenerate boxes
        bw[:, ::7] = 0.0
        box = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                       axis=-1).astype(np.float32)
        box[:, 1::9] = box[:, ::9][:, :box[:, 1::9].shape[1]]  # exact dups
        proposals.append(torch.from_numpy(box))
        logits.append(torch.from_numpy(
            rs.randn(B, nl).astype(np.float32)))
    for li, (p, lg) in enumerate(zip(proposals, logits)):
        out[f"rpn.in.boxes.{li}"] = p.numpy()
        out[f"rpn.in.logits.{li}"] = lg.numpy()
    pre_nms, post_nms, nms_th, min_sz = 64, 32, 0.7, 0.0
    insts = prop_utils.find_top_rpn_proposals(
        proposals, logits, [(H, W)] * B, nms_th, pre_nms, post_nms,
        min_sz, training=False,
    )
    for bi, inst in enumerate(insts):
        out[f"rpn.out.boxes.{bi}"] = inst.proposal_boxes.tensor.numpy()
        out[f"rpn.out.logits.{bi}"] = inst.objectness_logits.numpy()
    out["rpn.params"] = np.array([nms_th, pre_nms, post_nms, min_sz, H, W],
                                 np.float64)

    # ---- B. fast_rcnn_inference --------------------------------------
    N, C = 128, 9
    cx = rs.uniform(0, W, N)
    cy = rs.uniform(0, H, N)
    bw = rs.uniform(4, 70, N)
    bh = rs.uniform(4, 70, N)
    bx = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                  axis=-1).astype(np.float32)
    raw = rs.randn(N, C + 1).astype(np.float32) * 2.0
    probs = np.exp(raw) / np.exp(raw).sum(-1, keepdims=True)
    out["frcnn.in.boxes"] = bx
    out["frcnn.in.probs"] = probs
    score_th, nms_th2, topk = 0.05, 0.5, 20
    insts, kept = fast_rcnn.fast_rcnn_inference(
        [torch.from_numpy(bx)], [torch.from_numpy(probs)], [(H, W)],
        score_th, nms_th2, topk,
    )
    out["frcnn.out.boxes"] = insts[0].pred_boxes.tensor.numpy()
    out["frcnn.out.scores"] = insts[0].scores.numpy()
    out["frcnn.out.classes"] = insts[0].pred_classes.numpy().astype(np.int64)
    out["frcnn.params"] = np.array([score_th, nms_th2, topk, H, W], np.float64)

    # ---- C. paste_masks_in_image -------------------------------------
    K, M = 6, 28
    ml = rs.randn(K, M, M).astype(np.float32) * 2.0
    # blobby logits: low-freq fields so thresholded masks are compact
    for i in range(K):
        yy, xx = np.mgrid[0:M, 0:M]
        cyx = rs.uniform(6, 22, 2)
        r = rs.uniform(5, 12)
        ml[i] = ((r ** 2 - ((yy - cyx[0]) ** 2 + (xx - cyx[1]) ** 2)) / 8.0)
    pb = np.stack([
        rs.uniform(0, W - 50, K), rs.uniform(0, H - 50, K),
        np.zeros(K), np.zeros(K)], axis=-1).astype(np.float32)
    pb[:, 2] = pb[:, 0] + rs.uniform(10, 50, K)
    pb[:, 3] = pb[:, 1] + rs.uniform(10, 50, K)
    probs_m = 1.0 / (1.0 + np.exp(-ml))
    pasted = mask_ops.paste_masks_in_image(
        torch.from_numpy(probs_m), Boxes(torch.from_numpy(pb)),
        (H, W), threshold=0.5,
    )
    out["paste.in.mask_probs"] = probs_m
    out["paste.in.boxes"] = pb
    out["paste.out.masks"] = pasted.numpy().astype(np.uint8)

    # ---- D. full render chain: sem upsample + paste + fusion ---------
    Kf, Cs = 10, 6
    s4h, s4w = H // 4, W // 4
    sem_logits = rs.randn(s4h, s4w, Cs).astype(np.float32)
    # smooth the logits so stuff regions have realistic areas
    from scipy.ndimage import gaussian_filter

    for ci in range(Cs):
        sem_logits[..., ci] = gaussian_filter(sem_logits[..., ci], 3.0) * 8
    fml = np.zeros((Kf, M, M), np.float32)
    for i in range(Kf):
        yy, xx = np.mgrid[0:M, 0:M]
        cyx = rs.uniform(4, 24, 2)
        r = rs.uniform(6, 14)
        fml[i] = (r ** 2 - ((yy - cyx[0]) ** 2 + (xx - cyx[1]) ** 2)) / 6.0
    fb = np.zeros((Kf, 4), np.float32)
    fb[:, 0] = rs.uniform(0, W - 60, Kf)
    fb[:, 1] = rs.uniform(0, H - 60, Kf)
    fb[:, 2] = fb[:, 0] + rs.uniform(16, 60, Kf)
    fb[:, 3] = fb[:, 1] + rs.uniform(16, 60, Kf)
    fscores = rs.uniform(0.3, 1.0, Kf).astype(np.float32)
    fscores[3] = fscores[5]          # exact tie -> argsort order pinned
    fclasses = rs.randint(0, 12, Kf).astype(np.int64)
    overlap_th, stuff_area, conf_th = 0.5, 64, 0.5

    sem_t = torch.from_numpy(sem_logits).permute(2, 0, 1)[None]
    sem_up = torch.nn.functional.interpolate(
        sem_t, size=(H, W), mode="bilinear", align_corners=False)[0]
    sem_arg = sem_up.argmax(0)
    fprobs = 1.0 / (1.0 + np.exp(-fml))
    fmasks = mask_ops.paste_masks_in_image(
        torch.from_numpy(fprobs), Boxes(torch.from_numpy(fb)),
        (H, W), threshold=0.5,
    )
    inst = Instances((H, W))
    inst.scores = torch.from_numpy(fscores)
    inst.pred_classes = torch.from_numpy(fclasses)
    inst.pred_masks = fmasks
    pan, segs = pan_mod.combine_semantic_and_instance_outputs(
        inst, sem_arg, overlap_th, stuff_area, conf_th)
    out["fusion.in.sem_logits"] = sem_logits
    out["fusion.in.mask_logits"] = fml
    out["fusion.in.boxes"] = fb
    out["fusion.in.scores"] = fscores
    out["fusion.in.classes"] = fclasses
    out["fusion.params"] = np.array(
        [overlap_th, stuff_area, conf_th, H, W], np.float64)
    out["fusion.out.sem_argmax"] = sem_arg.numpy().astype(np.int32)
    out["fusion.out.panoptic"] = pan.numpy().astype(np.int32)
    out["fusion.out.segments"] = np.frombuffer(
        json.dumps(segs).encode(), dtype=np.uint8)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays, "
          f"{os.path.getsize(OUT) / 1e6:.2f} MB")
    print("rpn kept:", [out[f'rpn.out.boxes.{b}'].shape[0] for b in range(B)],
          "| frcnn kept:", out["frcnn.out.boxes"].shape[0],
          "| fusion segments:", len(segs))


if __name__ == "__main__":
    main()
