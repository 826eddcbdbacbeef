"""Loss functions.

Counterpart of ``detectron2/layers/losses.py`` (diou :5, ciou :66), fvcore's
smooth_l1/giou used by the reference's RPN & FastRCNN heads, plus masked CE
helpers needed because TPU batches carry padding.
All losses return *per-element* values; callers apply masks and normalize.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Huber/smooth-L1; beta=0 degrades to pure L1 (fvcore semantics)."""
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _box_wh(b):
    return jnp.maximum(b[..., 2] - b[..., 0], 0.0), jnp.maximum(b[..., 3] - b[..., 1], 0.0)


def _pairwise_aligned(boxes1, boxes2):
    x1 = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    y1 = jnp.maximum(boxes1[..., 1], boxes2[..., 1])
    x2 = jnp.minimum(boxes1[..., 2], boxes2[..., 2])
    y2 = jnp.minimum(boxes1[..., 3], boxes2[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    w1, h1 = _box_wh(boxes1)
    w2, h2 = _box_wh(boxes2)
    union = w1 * h1 + w2 * h2 - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-7), 0.0)
    return iou, union


def giou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU loss on aligned boxes (fvcore giou_loss semantics)."""
    iou, union = _pairwise_aligned(boxes1, boxes2)
    ex1 = jnp.minimum(boxes1[..., 0], boxes2[..., 0])
    ey1 = jnp.minimum(boxes1[..., 1], boxes2[..., 1])
    ex2 = jnp.maximum(boxes1[..., 2], boxes2[..., 2])
    ey2 = jnp.maximum(boxes1[..., 3], boxes2[..., 3])
    enclose = jnp.maximum(ex2 - ex1, 0.0) * jnp.maximum(ey2 - ey1, 0.0)
    giou = iou - jnp.where(
        enclose > 0, (enclose - union) / jnp.maximum(enclose, 1e-7), 0.0
    )
    return 1.0 - giou


def diou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Distance-IoU loss (ref layers/losses.py:5-63)."""
    iou, _ = _pairwise_aligned(boxes1, boxes2)
    cx1 = (boxes1[..., 0] + boxes1[..., 2]) * 0.5
    cy1 = (boxes1[..., 1] + boxes1[..., 3]) * 0.5
    cx2 = (boxes2[..., 0] + boxes2[..., 2]) * 0.5
    cy2 = (boxes2[..., 1] + boxes2[..., 3]) * 0.5
    center_dist = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    ex1 = jnp.minimum(boxes1[..., 0], boxes2[..., 0])
    ey1 = jnp.minimum(boxes1[..., 1], boxes2[..., 1])
    ex2 = jnp.maximum(boxes1[..., 2], boxes2[..., 2])
    ey2 = jnp.maximum(boxes1[..., 3], boxes2[..., 3])
    diag = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    return 1.0 - iou + center_dist / jnp.maximum(diag, 1e-7)


def ciou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Complete-IoU loss (ref layers/losses.py:66-133)."""
    iou, _ = _pairwise_aligned(boxes1, boxes2)
    d = diou_loss(boxes1, boxes2)
    w1, h1 = _box_wh(boxes1)
    w2, h2 = _box_wh(boxes2)
    v = (4.0 / math.pi**2) * (
        jnp.arctan(w2 / jnp.maximum(h2, 1e-7))
        - jnp.arctan(w1 / jnp.maximum(h1, 1e-7))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.maximum(1.0 - iou + v, 1e-7))
    return d + alpha * v


def sigmoid_focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0
) -> jnp.ndarray:
    """Per-element focal loss (fvcore sigmoid_focal_loss; RetinaNet/FCOS)."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        a_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = a_t * loss
    return loss


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross-entropy on logits, per-element.
    Computed in float32 regardless of input dtype (AMP safety)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element softmax cross-entropy with integer labels.

    Out-of-range labels (e.g. padding) are clamped; callers mask the result.
    Computed in float32 regardless of input dtype (AMP safety).
    """
    logits = logits.astype(jnp.float32)
    num = logits.shape[-1]
    safe = jnp.clip(labels, 0, num - 1)
    logz = jax.nn.logsumexp(logits, axis=-1)
    # select the label logit via a masked reduction, not take_along_axis:
    # a per-element gather over millions of pixels costs ~33 ms/step on TPU
    # (plus a scatter in the backward); the masked sum fuses into the same
    # pass as logsumexp and its gradient is a dense broadcast. where (not
    # logits * one_hot) so a non-finite logit in an unselected class (bf16
    # overflow, -inf class masking) cannot poison the row with inf * 0.
    one_hot = safe[..., None] == jnp.arange(num, dtype=safe.dtype)
    picked = jnp.sum(jnp.where(one_hot, logits, 0.0), axis=-1)
    return logz - picked


def softmax_ce_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_label: int = 255
) -> jnp.ndarray:
    """Mean softmax CE over pixels whose label != ignore_label (the sem-seg
    loss, ref meta_arch/semantic_seg.py:255-266 F.cross_entropy ignore 255)."""
    valid = labels != ignore_label
    per = softmax_ce(logits, jnp.where(valid, labels, 0))
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(per * valid) / denom
