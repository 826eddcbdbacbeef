"""End-to-end forward tests on random data, no weights — the counterpart of
the reference's tests/modeling/test_model_e2e.py (incl. empty-GT edge case)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles (see pytest.ini / dev/run_tests.sh)

from u2seg_tpu.config.config import Config
from u2seg_tpu.models.panoptic_fpn import PanopticFPN, combine_semantic_and_instance
from u2seg_tpu.structures.instances import Detections, GtInstances


def tiny_config(cascade=True) -> Config:
    cfg = Config()
    m = cfg.model
    m.compute_dtype = "float32"
    m.resnet.norm = "BN"
    m.fpn.norm = ""
    m.roi_heads.num_classes = 7
    m.roi_heads.batch_size_per_image = 32
    m.roi_heads.detections_per_image = 10
    m.sem_seg_head.num_classes = 5
    m.rpn.pre_nms_topk_train = 64
    m.rpn.post_nms_topk_train = 64
    m.rpn.pre_nms_topk_test = 64
    m.rpn.post_nms_topk_test = 32
    m.rpn.batch_size_per_image = 32
    if not cascade:
        m.roi_heads.name = "StandardROIHeads"
    return cfg


def synthetic_inputs(rng, b=2, h=128, w=128, g=4, patch=32):
    images = jnp.array(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    image_sizes = jnp.array([[h, w]] * b, dtype=jnp.int32)
    xy = rng.rand(b, g, 2) * (h / 2)
    wh = rng.rand(b, g, 2) * (h / 3) + 8
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    classes = rng.randint(0, 7, (b, g)).astype(np.int32)
    valid = np.ones((b, g), bool)
    masks = (rng.rand(b, g, patch, patch) > 0.4).astype(np.float32)
    gt = GtInstances(
        boxes=jnp.array(boxes), classes=jnp.array(classes),
        valid=jnp.array(valid), masks=jnp.array(masks),
    )
    sem_gt = jnp.array(rng.randint(0, 5, (b, h, w)).astype(np.int32))
    return images, image_sizes, gt, sem_gt


@pytest.mark.parametrize("cascade", [False, True])
def test_train_forward_losses_finite(rng, cascade):
    cfg = tiny_config(cascade)
    model = PanopticFPN(cfg.model)
    images, sizes, gt, sem_gt = synthetic_inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, sizes, gt=gt, sem_seg_gt=sem_gt, train=True,
    )
    losses, _ = model.apply(
        variables, images, sizes, gt=gt, sem_seg_gt=sem_gt, train=True,
        rngs={"sampling": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    expected = {"loss_sem_seg", "loss_rpn_cls", "loss_rpn_loc", "loss_mask"}
    if cascade:
        expected |= {f"loss_cls_stage{i}" for i in range(3)}
        expected |= {f"loss_box_reg_stage{i}" for i in range(3)}
    else:
        expected |= {"loss_cls", "loss_box_reg"}
    assert set(losses.keys()) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} is not finite: {v}"


def test_train_forward_empty_gt(rng):
    cfg = tiny_config(cascade=False)
    model = PanopticFPN(cfg.model)
    images, sizes, gt, sem_gt = synthetic_inputs(rng)
    import dataclasses
    gt = dataclasses.replace(gt, valid=jnp.zeros_like(gt.valid))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, sizes, gt=gt, sem_seg_gt=sem_gt, train=True,
    )
    losses, _ = model.apply(
        variables, images, sizes, gt=gt, sem_seg_gt=sem_gt, train=True,
        rngs={"sampling": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite with empty GT: {v}"


def test_inference_forward(rng):
    cfg = tiny_config(cascade=True)
    model = PanopticFPN(cfg.model)
    images, sizes, gt, sem_gt = synthetic_inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images, sizes, gt=gt, sem_seg_gt=sem_gt, train=True,
    )
    out = model.apply(variables, images, sizes, train=False, combine=True)
    det = out.detections
    assert det.boxes.shape == (2, 10, 4)
    assert det.mask_logits.shape[:2] == (2, 10)
    assert out.sem_seg_logits.shape == (2, 32, 32, 5)  # stride-4 logits
    assert out.panoptic.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_fusion_semantics():
    # hand-crafted: one confident instance + one big stuff region
    k, h, w, stuff = 3, 16, 16, 4
    boxes = jnp.array([[[0.0, 0.0, 32.0, 32.0]] * k])
    scores = jnp.array([[0.9, 0.3, 0.0]])
    classes = jnp.array([[2, 1, 0]], dtype=jnp.int32)
    valid = jnp.array([[True, True, False]])
    mask_logits = jnp.full((1, k, 28, 28), 10.0)  # all-on masks
    det = Detections(boxes, scores, classes, valid, mask_logits)
    # fusion consumes stride-4 logits: (1, h, w, stuff) for a (4h, 4w) image
    sem = jnp.zeros((1, h, w, stuff)).at[..., 3].set(5.0)  # label 3 wins
    sizes = jnp.array([[h * 4, w * 4]], dtype=jnp.int32)
    pan, cat, isth, score, seg_valid, inst = combine_semantic_and_instance(
        det, sem, sizes, instance_conf_thresh=0.5, overlap_thresh=0.5,
        stuff_area_limit=100,
    )
    pan = np.asarray(pan)[0]
    # instance 0 (score .9) claims its box region: id 1
    assert pan[0, 0] == 1
    # instance at rank 1 (score .3 < .5) skipped -> no id 2 pixels
    assert not (pan == 2).any()
    # stuff label 3 claims the rest: id k+1+3 = 7
    assert pan[15, 15] == 7
    sv = np.asarray(seg_valid)[0]
    assert sv[0] and not sv[1] and not sv[2]        # only top instance
    assert sv[k + 3] and not sv[k + 1]              # only stuff label 3
    # instance category recorded correctly
    assert int(np.asarray(cat)[0][0]) == 2


def test_fusion_fixpoint_matches_sequential_greedy():
    """The fixpoint formulation of combine_semantic_and_instance must equal
    the literal sequential greedy of the reference (panoptic_fpn.py:184-269),
    including drop-chain cases (an instance dropped for overlap frees its
    pixels for later instances)."""
    from u2seg_tpu.ops.mask_paste import paste_masks

    rng = np.random.RandomState(7)
    k, h4, w4, stuff = 24, 32, 48, 6
    stride = 4
    conf, ovl, area_lim = 0.5, 0.5, 64

    for trial in range(5):
        # heavily overlapping boxes to exercise drop chains
        cx = rng.rand(k) * w4 * stride
        cy = rng.rand(k) * h4 * stride
        s = rng.rand(k) * 60 + 12
        boxes = np.stack([cx - s, cy - s, cx + s, cy + s], -1).astype(np.float32)
        scores = rng.rand(k).astype(np.float32)
        classes = rng.randint(0, 5, k).astype(np.int32)
        valid = rng.rand(k) > 0.1
        mask_logits = (rng.randn(k, 28, 28) * 2 + 1.0).astype(np.float32)
        sem = rng.randn(1, h4, w4, stuff).astype(np.float32) * 2
        sizes = np.array([[h4 * stride, w4 * stride]], np.int32)

        det = Detections(
            boxes=jnp.array(boxes[None]), scores=jnp.array(scores[None]),
            classes=jnp.array(classes[None]), valid=jnp.array(valid[None]),
            mask_logits=jnp.array(mask_logits[None]),
        )
        pan, cat, isth, sscore, seg_valid, inst = combine_semantic_and_instance(
            det, jnp.array(sem), jnp.array(sizes),
            instance_conf_thresh=conf, overlap_thresh=ovl,
            stuff_area_limit=area_lim,
        )
        pan = np.asarray(pan)[0]
        seg_valid = np.asarray(seg_valid)[0]

        # ---- literal sequential greedy reference ----
        ordr = np.argsort(-np.where(valid, scores, -np.inf))
        masks = np.asarray(paste_masks(
            jax.nn.sigmoid(jnp.array(mask_logits[ordr])),
            jnp.array(boxes[ordr]) / stride, h4, w4)) > 0.5
        claimed = np.zeros((h4, w4), bool)
        ref_pan = np.zeros((h4, w4), np.int32)
        ref_takes = np.zeros(k, bool)
        for i in range(k):
            m = masks[i]
            area = m.sum()
            inter = (m & claimed).sum()
            take = (valid[ordr][i] and scores[ordr][i] >= conf and area > 0
                    and inter / max(area, 1) <= ovl)
            if take:
                paint = m & ~claimed
                ref_pan[paint] = i + 1
                claimed |= paint
                ref_takes[i] = True
        sem_lab = sem[0].argmax(-1)
        stuff_mask = ~claimed & (sem_lab > 0)
        for lab in range(1, stuff):
            lm = stuff_mask & (sem_lab == lab)
            if lm.sum() * stride * stride >= area_lim:
                ref_pan[lm] = k + 1 + lab

        np.testing.assert_array_equal(pan, ref_pan, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(seg_valid[:k], ref_takes,
                                      err_msg=f"trial {trial} takes")
