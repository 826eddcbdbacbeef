"""Build a REAL detectron2 PanopticFPN state dict from the reference source.

Executes the reference's own model code (/root/reference/detectron2) with
its small import surface stubbed (no torchvision/fvcore/yacs needed for
module CONSTRUCTION), instantiates the u2seg architecture pieces
(R50-FPN SyncBN backbone, RPN head, 3x cascade box heads + predictors,
mask head, SemSegFPNHead), seeds every parameter/buffer deterministically,
and writes the flat ``state_dict()`` (exact d2 key names, shapes, values)
to ``tests/golden/fixtures/d2_panoptic_fpn_state.npz``.

The converter golden test then checks ``convert_d2_panoptic_fpn`` maps this
REAL layout (not one synthesized from the converter's own inverse) onto our
model tree with nothing left over.

Run: python dev/make_d2_state_dict.py   (needs /root/reference + torch-cpu)
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch
from torch import nn

REF = "/root/reference/detectron2"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "fixtures", "d2_panoptic_fpn_state.npz")
OUT_ACT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "fixtures", "d2_activations.npz")


# ---------------------------------------------------------------------------
# Stub modules (import-surface only; behavior irrelevant for state_dict)
# ---------------------------------------------------------------------------

def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    # fvcore.nn.weight_init — real init semantics (c2_model_loading parity
    # does not depend on init values; we overwrite all params after build)
    def c2_msra_fill(m):
        nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
        if m.bias is not None:
            nn.init.constant_(m.bias, 0)

    def c2_xavier_fill(m):
        nn.init.kaiming_uniform_(m.weight, a=1)
        if m.bias is not None:
            nn.init.constant_(m.bias, 0)

    wi = _module("fvcore.nn.weight_init", c2_msra_fill=c2_msra_fill,
                 c2_xavier_fill=c2_xavier_fill)
    fd = _module("fvcore.nn.distributed",
                 differentiable_all_reduce=lambda x: x)
    _module("fvcore.nn", weight_init=wi, distributed=fd,
            giou_loss=None, smooth_l1_loss=None, sigmoid_focal_loss_jit=None)
    _module("fvcore", )

    comm = _module("detectron2.utils.comm", get_world_size=lambda: 1,
                   get_local_size=lambda: 1, get_local_rank=lambda: 0)
    env = _module("detectron2.utils.env", TORCH_VERSION=(2, 99))
    tracing = _module("detectron2.utils.tracing",
                      assert_fx_safe=lambda *a, **k: None,
                      is_fx_tracing=lambda: False)
    utils_pkg = _module("detectron2.utils", comm=comm, env=env,
                        tracing=tracing)
    utils_pkg.__path__ = []  # mark as package so submodule imports resolve

    class Registry:
        def __init__(self, name):
            self._name = name
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(o):
                    self._map[o.__name__] = o
                    return o
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    _module("detectron2.utils.registry", Registry=Registry)
    _module("detectron2.utils.memory",
            retry_if_cuda_oom=lambda f: f)
    _module("detectron2.utils.events", get_event_storage=lambda: None)

    # config.configurable: pass-through decorator (we construct with
    # explicit kwargs only)
    def configurable(init_func=None, *, from_config=None):
        if init_func is not None:
            return init_func

        def wrapper(f):
            return f

        return wrapper

    _module("detectron2.config", configurable=configurable)

    # structures: construction-time unused; import-surface only
    _module("detectron2.structures", Boxes=object, ImageList=object,
            Instances=object, RotatedBoxes=object, pairwise_iou=None,
            pairwise_iou_rotated=None, BitMasks=object, PolygonMasks=object,
            ROIMasks=object, Keypoints=object, heatmaps_to_keypoints=None)

    # torchvision import surface (never called for state-dict construction)
    tv_ops = _module("torchvision.ops", RoIPool=object, nms=None,
                     roi_align=None, box_iou=None, batched_nms=None)
    _module("torchvision", ops=tv_ops)

    data_du = _module("detectron2.data.detection_utils",
                      get_fed_loss_cls_weights=lambda *a, **k: None)
    data_pkg = _module("detectron2.data", detection_utils=data_du)
    data_pkg.__path__ = []

    d2 = _module("detectron2")  # parent placeholder
    d2.__path__ = []


def load_ref(rel_path, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, rel_path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_layers_module():
    """detectron2.layers assembled from the real shape_spec/wrappers/
    batch_norm/blocks sources + dummies for the CUDA-backed ops."""
    pkg = types.ModuleType("d2L")
    pkg.__path__ = [os.path.join(REF, "layers")]
    sys.modules["d2L"] = pkg
    shape_spec = load_ref("layers/shape_spec.py", "d2L.shape_spec")
    wrappers = load_ref("layers/wrappers.py", "d2L.wrappers")
    batch_norm = load_ref("layers/batch_norm.py", "d2L.batch_norm")

    class _Dummy(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    _module(
        "detectron2.layers",
        ShapeSpec=shape_spec.ShapeSpec,
        Conv2d=wrappers.Conv2d,
        ConvTranspose2d=wrappers.ConvTranspose2d,
        BatchNorm2d=wrappers.BatchNorm2d,
        cat=wrappers.cat,
        interpolate=getattr(wrappers, "interpolate", None),
        get_norm=batch_norm.get_norm,
        FrozenBatchNorm2d=batch_norm.FrozenBatchNorm2d,
        NaiveSyncBatchNorm=batch_norm.NaiveSyncBatchNorm,
        CNNBlockBase=None,  # filled from blocks.py below
        DeformConv=_Dummy, ModulatedDeformConv=_Dummy,
        ROIAlign=_Dummy, ROIAlignRotated=_Dummy,
        batched_nms=None, nonzero_tuple=None, move_device_like=None,
        ciou_loss=None, diou_loss=None, ASPP=None, DepthwiseSeparableConv2d=None,
        batched_nms_rotated=None, paste_masks_in_image=None,
        cross_entropy=None, roi_align=None, roi_align_rotated=None,
        Linear=nn.Linear, nms=None, nms_rotated=None,
        shapes_to_tensor=getattr(wrappers, "shapes_to_tensor", None),
    )
    blocks = load_ref("layers/blocks.py", "d2L.blocks")
    Lmod = sys.modules["detectron2.layers"]
    Lmod.CNNBlockBase = blocks.CNNBlockBase
    Lmod.__path__ = []          # package-ify for .wrappers submodule imports
    wrappers.move_device_like = getattr(
        wrappers, "move_device_like", lambda src, dst: src)
    sys.modules["detectron2.layers.wrappers"] = wrappers
    Lmod.wrappers = wrappers
    return Lmod


def build_backbone_pkg():
    """Fake package 'd2bb' holding backbone.py/build.py/resnet.py/fpn.py so
    their relative imports resolve."""
    import importlib.util

    pkg = types.ModuleType("d2bb")
    pkg.__path__ = [os.path.join(REF, "modeling/backbone")]
    sys.modules["d2bb"] = pkg
    for stem in ("backbone", "build", "resnet", "fpn"):
        path = os.path.join(REF, "modeling/backbone", stem + ".py")
        spec = importlib.util.spec_from_file_location(f"d2bb.{stem}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"d2bb.{stem}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, stem, mod)
    return pkg


def _rs_for(key: str) -> np.random.RandomState:
    """Stable per-key RNG. NOTE: ``hash(str)`` is salted per process, so the
    original fixture was not reproducible across runs; crc32 is."""
    import zlib

    return np.random.RandomState(zlib.crc32(key.encode("utf-8")) % (2**31))


def seed_module(module: nn.Module):
    """Overwrite every param/buffer with a deterministic value derived from
    its NAME — layout drift changes values, not just keys.

    Magnitudes are chosen so a forward pass stays O(1) through 50+ layers
    (the activation goldens need non-degenerate values): conv/fc weights
    get fan-in-scaled randn, norm scales sit near 1, running_var is
    positive near 1, biases/means are small."""
    state = module.state_dict()
    for k in state:
        t = state[k]
        if not t.dtype.is_floating_point:
            state[k] = torch.zeros_like(t)  # num_batches_tracked etc.
            continue
        rs = _rs_for(k)
        shape = tuple(t.shape)
        if k.endswith("running_var"):
            v = np.abs(1.0 + 0.1 * rs.randn(*shape)) + 1e-3
        elif k.endswith("running_mean"):
            v = 0.05 * rs.randn(*shape)
        elif len(shape) == 1 and k.endswith(".weight"):
            v = 1.0 + 0.1 * rs.randn(*shape)       # norm affine scale
        elif len(shape) == 1:
            v = 0.05 * rs.randn(*shape)             # biases
        else:
            fan_in = int(np.prod(shape[1:]))
            v = rs.randn(*shape) * np.sqrt(2.0 / max(fan_in, 1))
        state[k] = torch.from_numpy(v.astype(np.float32))
    module.load_state_dict(state)


def main():
    install_stubs()
    build_layers_module()
    bb = build_backbone_pkg()
    L = sys.modules["detectron2.layers"]

    # --- backbone: R50 SyncBN, stride_in_1x1=False, freeze_at=0 (u2seg) ---
    resnet = bb.resnet
    fpn = bb.fpn
    stem = resnet.BasicStem(in_channels=3, out_channels=64, norm="SyncBN")
    stages = resnet.ResNet.make_default_stages(
        50, stride_in_1x1=False, norm="SyncBN")
    r50 = resnet.ResNet(stem, stages,
                        out_features=["res2", "res3", "res4", "res5"],
                        freeze_at=0)
    backbone = fpn.FPN(
        bottom_up=r50, in_features=["res2", "res3", "res4", "res5"],
        out_channels=256, norm="SyncBN", top_block=fpn.LastLevelMaxPool(),
        fuse_type="sum",
    )

    full = nn.Module()
    full.add_module("backbone", backbone)

    # --- RPN head (proposal_generator.rpn_head) ---
    import importlib.util

    pg = types.ModuleType("d2pg")
    pg.__path__ = [os.path.join(REF, "modeling/proposal_generator")]
    sys.modules["d2pg"] = pg
    # rpn.py relative imports: ..anchor_generator/..box_regression/..matcher/
    # ..sampling + .build/.proposal_utils — register a parent 'd2m' package
    d2m = types.ModuleType("d2m")
    d2m.__path__ = [os.path.join(REF, "modeling")]
    sys.modules["d2m"] = d2m
    for stem_name in ("anchor_generator", "box_regression", "matcher",
                      "sampling"):
        path = os.path.join(REF, "modeling", stem_name + ".py")
        spec = importlib.util.spec_from_file_location(f"d2m.{stem_name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"d2m.{stem_name}"] = mod
        spec.loader.exec_module(mod)
        setattr(d2m, stem_name, mod)
    d2mpg = types.ModuleType("d2m.proposal_generator")
    d2mpg.__path__ = [os.path.join(REF, "modeling/proposal_generator")]
    sys.modules["d2m.proposal_generator"] = d2mpg
    # pre-install a fake .build so rpn.py's registry import does not drag
    # in rrpn (rotated ops)
    from detectron2.utils.registry import Registry as _Reg
    fake_build = types.ModuleType("d2m.proposal_generator.build")
    fake_build.PROPOSAL_GENERATOR_REGISTRY = _Reg("PROPOSAL_GENERATOR")
    sys.modules["d2m.proposal_generator.build"] = fake_build
    d2mpg.build = fake_build
    for stem_name in ("proposal_utils", "rpn"):
        path = os.path.join(REF, "modeling/proposal_generator",
                            stem_name + ".py")
        spec = importlib.util.spec_from_file_location(
            f"d2m.proposal_generator.{stem_name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"d2m.proposal_generator.{stem_name}"] = mod
        spec.loader.exec_module(mod)
        setattr(d2mpg, stem_name, mod)
    rpn_head = d2mpg.rpn.StandardRPNHead(
        in_channels=256, num_anchors=3, box_dim=4, conv_dims=(-1,))
    prop = nn.Module()
    prop.add_module("rpn_head", rpn_head)
    full.add_module("proposal_generator", prop)

    # --- ROI heads: cascade box heads/predictors + mask head ---
    # alias the already-loaded modeling submodules under the absolute name
    # fast_rcnn.py imports (detectron2.modeling.box_regression)
    d2mod = types.ModuleType("detectron2.modeling")
    d2mod.__path__ = []
    d2mod.box_regression = sys.modules["d2m.box_regression"]
    sys.modules["detectron2.modeling"] = d2mod
    sys.modules["detectron2.modeling.box_regression"] = \
        sys.modules["d2m.box_regression"]

    d2mrh = types.ModuleType("d2m.roi_heads")
    d2mrh.__path__ = [os.path.join(REF, "modeling/roi_heads")]
    sys.modules["d2m.roi_heads"] = d2mrh
    # poolers lives one level up and is imported by roi_heads modules
    for name, rel in (("poolers", "modeling/poolers.py"),):
        spec = importlib.util.spec_from_file_location(f"d2m.{name}",
                                                      os.path.join(REF, rel))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"d2m.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(d2m, name, mod)
    for stem_name in ("box_head", "fast_rcnn", "mask_head"):
        path = os.path.join(REF, "modeling/roi_heads", stem_name + ".py")
        spec = importlib.util.spec_from_file_location(
            f"d2m.roi_heads.{stem_name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"d2m.roi_heads.{stem_name}"] = mod
        spec.loader.exec_module(mod)
        setattr(d2mrh, stem_name, mod)

    ShapeSpec = L.ShapeSpec
    roi = nn.Module()
    box_heads, box_predictors = nn.ModuleList(), nn.ModuleList()
    for _ in range(3):
        bh = d2mrh.box_head.FastRCNNConvFCHead(
            input_shape=ShapeSpec(channels=256, height=7, width=7),
            conv_dims=[], fc_dims=[1024, 1024])
        b2b = sys.modules["d2m.box_regression"].Box2BoxTransform(
            weights=(10.0, 10.0, 5.0, 5.0))
        bp = d2mrh.fast_rcnn.FastRCNNOutputLayers(
            input_shape=ShapeSpec(channels=1024),
            box2box_transform=b2b, num_classes=800,
            cls_agnostic_bbox_reg=True)
        box_heads.append(bh)
        box_predictors.append(bp)
    roi.add_module("box_head", box_heads)
    roi.add_module("box_predictor", box_predictors)
    mask_head = d2mrh.mask_head.MaskRCNNConvUpsampleHead(
        input_shape=ShapeSpec(channels=256, height=14, width=14),
        num_classes=800, conv_dims=[256, 256, 256, 256, 256],
        conv_norm="")
    roi.add_module("mask_head", mask_head)
    full.add_module("roi_heads", roi)

    # --- SemSegFPNHead ---
    d2ma = types.ModuleType("d2m.meta_arch")
    d2ma.__path__ = [os.path.join(REF, "modeling/meta_arch")]
    sys.modules["d2m.meta_arch"] = d2ma
    # semantic_seg.py relative imports: ..backbone (Backbone only), .build
    bb.backbone.build_backbone = bb.build.build_backbone
    sys.modules["d2m.backbone"] = bb.backbone
    d2m.backbone = bb.backbone
    # semantic_seg.py also imports .build (SEM_SEG_HEADS_REGISTRY) and
    # ..postprocessing — pre-install fakes
    from detectron2.utils.registry import Registry as _Reg2
    fake_ma_build = types.ModuleType("d2m.meta_arch.build")
    fake_ma_build.META_ARCH_REGISTRY = _Reg2("META_ARCH")
    sys.modules["d2m.meta_arch.build"] = fake_ma_build
    fake_post = types.ModuleType("d2m.postprocessing")
    fake_post.sem_seg_postprocess = lambda *a, **k: None
    sys.modules["d2m.postprocessing"] = fake_post
    d2m.postprocessing = fake_post
    path = os.path.join(REF, "modeling/meta_arch", "semantic_seg.py")
    spec = importlib.util.spec_from_file_location("d2m.meta_arch.semantic_seg",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["d2m.meta_arch.semantic_seg"] = mod
    spec.loader.exec_module(mod)
    sem_head = mod.SemSegFPNHead(
        input_shape={
            "p2": ShapeSpec(channels=256, stride=4),
            "p3": ShapeSpec(channels=256, stride=8),
            "p4": ShapeSpec(channels=256, stride=16),
            "p5": ShapeSpec(channels=256, stride=32),
        },
        num_classes=28, conv_dims=128, common_stride=4, norm="GN",
    )
    full.add_module("sem_seg_head", sem_head)

    seed_module(full)
    sd = full.state_dict()
    payload = {k: v.numpy() for k, v in sd.items()}
    np.savez(OUT, **payload)
    print(f"wrote {OUT}: {len(payload)} tensors")
    groups = {}
    for k in payload:
        groups.setdefault(k.split(".")[0], 0)
        groups[k.split(".")[0]] += 1
    print(groups)

    acts = capture_activations(full)
    np.savez_compressed(OUT_ACT, **acts)
    sz = os.path.getsize(OUT_ACT) / 1e6
    print(f"wrote {OUT_ACT}: {len(acts)} arrays, {sz:.1f} MB")


def capture_activations(full: nn.Module) -> dict:
    """Run the seeded reference modules forward and record per-module
    outputs (the reference's own acc-test pattern: utils/testing.py:95
    assert_instances_allclose + quick_schedules/*_inference_acc_test.yaml,
    reduced to module granularity on deterministic inputs).

    Captured on a fixed 64x64 image: ResNet C2-C5, FPN P2-P6, RPN head
    logits/deltas per level, per-stage cascade box-head features +
    predictor scores/deltas on fixed pooled ROIs, mask logits at the
    selected class channels, and stride-4 SemSegFPNHead logits. The JAX
    activation-parity golden (tests/golden/test_activation_parity.py)
    loads converted weights and pins its forwards to these arrays.
    """
    full.eval()
    acts = {}
    rs = np.random.RandomState(20260819)
    x = torch.from_numpy(rs.randn(1, 3, 64, 64).astype(np.float32))
    acts["input_image"] = x.numpy()
    levels = ("p2", "p3", "p4", "p5", "p6")
    with torch.no_grad():
        res = full.backbone.bottom_up(x)
        for k in ("res2", "res3", "res4", "res5"):
            acts[f"backbone.{k}"] = res[k].numpy()
        fp = full.backbone(x)
        for k in levels:
            acts[f"fpn.{k}"] = fp[k].numpy()

        logits, deltas = full.proposal_generator.rpn_head(
            [fp[k] for k in levels])
        for k, lg, dl in zip(levels, logits, deltas):
            acts[f"rpn.logits.{k}"] = lg.numpy()
            acts[f"rpn.deltas.{k}"] = dl.numpy()

        pooled7 = torch.from_numpy(
            rs.randn(8, 256, 7, 7).astype(np.float32) * 0.5)
        acts["pooled7"] = pooled7.numpy()
        for k in range(3):
            bh = full.roi_heads.box_head[k](pooled7)
            scores, box_deltas = full.roi_heads.box_predictor[k](bh)
            acts[f"box_head.{k}"] = bh.numpy()
            acts[f"box_scores.{k}"] = scores.numpy()
            acts[f"box_deltas.{k}"] = box_deltas.numpy()

        pooled14 = torch.from_numpy(
            rs.randn(8, 256, 14, 14).astype(np.float32) * 0.5)
        acts["pooled14"] = pooled14.numpy()
        mask_cls = rs.randint(0, 800, size=8).astype(np.int32)
        acts["mask_class_idx"] = mask_cls
        m = full.roi_heads.mask_head.layers(pooled14)      # (8, 800, 28, 28)
        acts["mask_logits_selected"] = m.numpy()[
            np.arange(8), mask_cls]                        # (8, 28, 28)

        sem = full.sem_seg_head.layers(
            {k: fp[k] for k in ("p2", "p3", "p4", "p5")})
        acts["sem_logits_s4"] = sem.numpy()                # (1, 28, 16, 16)
    return acts


if __name__ == "__main__":
    main()
