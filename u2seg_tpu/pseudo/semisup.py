"""Semi-supervised fine-tuning extras: FixMatch and SimCLRv2-style
fine-tuning of USL-selected labeled subsets.

Counterpart of ``u2seg/Instance_Clustering/semisup-fixmatch-cifar/``
(train.py:327-447: weak/strong consistency with confidence-thresholded
pseudo-labels, EMA teacher; dataset/randaugment.py RandAugmentMC) and
``semisup-simclrv2/fine_tune.py`` (head fine-tuning of a pretrained
contrastive backbone, optional frozen trunk, cosine LR). These consume the
per-cluster representatives picked by USL selection
(pseudo/kmeans.select_representatives_regularized) as the labeled set.

TPU formulation:
  - one jitted step takes the labeled batch and BOTH unlabeled views in a
    single concatenated forward — the reference's interleave/de_interleave
    (train.py:58-63) exists only to mix the three streams' BatchNorm batch
    statistics; a single concatenated batch through flax BN computes joint
    statistics directly, so no interleaving is needed;
  - EMA is a pure tree_map over param pytrees (models/ema.py analog);
  - the strong augmentation (RandAugmentMC n=2 m=10) runs host-side in
    numpy (randaugment_mc below), like the rest of the data pipeline.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# FixMatch loss + step
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FixMatchConfig:
    """train.py defaults: threshold 0.95, T 1.0, lambda_u 1.0, mu 7
    (unlabeled:labeled batch ratio), EMA decay 0.999."""

    threshold: float = 0.95
    temperature: float = 1.0
    lambda_u: float = 1.0
    mu: int = 7
    ema_decay: float = 0.999


def fixmatch_losses(
    logits_x: jnp.ndarray,    # (B, C) labeled logits
    targets_x: jnp.ndarray,   # (B,) int labels
    logits_u_w: jnp.ndarray,  # (mu*B, C) weak-view logits
    logits_u_s: jnp.ndarray,  # (mu*B, C) strong-view logits
    cfg: FixMatchConfig,
) -> Dict[str, jnp.ndarray]:
    """Lx = CE(labeled); pseudo-labels from the (stopped-gradient) weak
    view sharpened by T; Lu = mean over ALL unlabeled of CE(strong view,
    pseudo) masked by max-prob >= threshold (train.py:373-383)."""
    logp_x = jax.nn.log_softmax(logits_x, axis=-1)
    lx = -jnp.mean(jnp.take_along_axis(
        logp_x, targets_x[:, None].astype(jnp.int32), axis=-1))

    pseudo = jax.nn.softmax(
        jax.lax.stop_gradient(logits_u_w) / cfg.temperature, axis=-1)
    max_probs = jnp.max(pseudo, axis=-1)
    targets_u = jnp.argmax(pseudo, axis=-1)
    mask = (max_probs >= cfg.threshold).astype(logits_u_s.dtype)

    logp_s = jax.nn.log_softmax(logits_u_s, axis=-1)
    ce_u = -jnp.take_along_axis(logp_s, targets_u[:, None], axis=-1)[:, 0]
    lu = jnp.mean(ce_u * mask)
    return {
        "loss_x": lx,
        "loss_u": lu * cfg.lambda_u,
        "mask_rate": jnp.mean(mask),
    }


def ema_update(ema_params, params, decay: float):
    """ema <- decay * ema + (1 - decay) * params (models/ema.py update)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )


def make_fixmatch_train_step(
    apply_fn: Callable,              # (params, images, train) -> logits
    optimizer,                       # optax GradientTransformation
    cfg: FixMatchConfig = FixMatchConfig(),
    has_batch_stats: bool = False,
):
    """Build one jitted FixMatch step over (labeled, weak, strong) batches.

    ``apply_fn(variables, images, train=True)`` must return logits (and,
    when has_batch_stats, a (logits, new_variables) pair as flax mutable
    collections do). State: dict(params, ema_params, opt_state[,
    batch_stats]).
    """

    def step(state, images_x, targets_x, images_u_w, images_u_s):
        bx, bw = images_x.shape[0], images_u_w.shape[0]
        inputs = jnp.concatenate([images_x, images_u_w, images_u_s], 0)

        def loss_fn(params):
            variables = (
                {"params": params, "batch_stats": state["batch_stats"]}
                if has_batch_stats else {"params": params})
            if has_batch_stats:
                logits, new_vars = apply_fn(variables, inputs, True)
            else:
                logits, new_vars = apply_fn(variables, inputs, True), None
            losses = fixmatch_losses(
                logits[:bx], targets_x, logits[bx:bx + bw],
                logits[bx + bw:], cfg)
            total = losses["loss_x"] + losses["loss_u"]
            return total, (losses, new_vars)

        (total, (losses, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"])
        import optax

        params = optax.apply_updates(state["params"], updates)
        new_state = dict(
            state, params=params, opt_state=opt_state,
            ema_params=ema_update(state["ema_params"], params,
                                  cfg.ema_decay),
        )
        if has_batch_stats and new_vars is not None:
            new_state["batch_stats"] = new_vars["batch_stats"]
        return new_state, dict(losses, loss=total)

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# RandAugmentMC (strong augmentation, host-side numpy)
# ---------------------------------------------------------------------------

def _blend(a: np.ndarray, b: np.ndarray, f: float) -> np.ndarray:
    return np.clip(a + (b - a) * f, 0, 255).astype(np.uint8)


def _affine(img: np.ndarray, mat: np.ndarray) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    return cv2.warpAffine(img, mat[:2], (w, h), flags=cv2.INTER_NEAREST,
                          borderValue=(128, 128, 128))


def randaugment_mc(img: np.ndarray, rng: np.random.RandomState,
                   n: int = 2, m: int = 10) -> np.ndarray:
    """RandAugmentMC(n, m): apply n randomly chosen ops at magnitude
    sampled up to m (semisup-fixmatch-cifar/dataset/randaugment.py, the
    fixed-magnitude CTAugment-free variant used by FixMatch). Pixel ops in
    numpy, geometric ops via cv2 affine with the gray (128) fill."""
    img = np.asarray(img, np.uint8).copy()
    gray = lambda x: x.mean(-1, keepdims=True).repeat(3, -1)  # noqa: E731

    def autocontrast(x, _):
        lo = x.min(axis=(0, 1), keepdims=True).astype(np.float32)
        hi = x.max(axis=(0, 1), keepdims=True).astype(np.float32)
        scale = 255.0 / np.maximum(hi - lo, 1.0)
        return np.clip((x - lo) * scale, 0, 255).astype(np.uint8)

    def brightness(x, v):
        return _blend(np.zeros_like(x), x, v)

    def color(x, v):
        return _blend(gray(x), x, v)

    def contrast(x, v):
        return _blend(np.full_like(x, int(x.mean())), x, v)

    def equalize(x, _):
        out = x.copy()
        for c in range(3):
            hist = np.bincount(x[..., c].ravel(), minlength=256)
            nz = hist[hist > 0]
            if len(nz) <= 1:
                continue
            step = (hist.sum() - nz[-1]) // 255
            if step == 0:
                continue
            lut = np.clip((np.cumsum(hist) - hist // 2) // step, 0, 255)
            out[..., c] = lut[x[..., c]]
        return out.astype(np.uint8)

    def identity(x, _):
        return x

    def posterize(x, v):
        bits = int(v)
        return (x >> (8 - bits)) << (8 - bits)

    def sharpness(x, v):
        import cv2

        smooth = cv2.blur(x, (3, 3))
        return _blend(smooth, x, v)

    def solarize(x, v):
        return np.where(x < int(v), x, 255 - x).astype(np.uint8)

    def rotate(x, v):
        import cv2

        h, w = x.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), v, 1.0)
        return _affine(x, np.vstack([mat, [0, 0, 1]]))

    def shear_x(x, v):
        return _affine(x, np.array([[1, v, 0], [0, 1, 0], [0, 0, 1]],
                                   np.float32))

    def shear_y(x, v):
        return _affine(x, np.array([[1, 0, 0], [v, 1, 0], [0, 0, 1]],
                                   np.float32))

    def translate_x(x, v):
        return _affine(x, np.array(
            [[1, 0, v * x.shape[1]], [0, 1, 0], [0, 0, 1]], np.float32))

    def translate_y(x, v):
        return _affine(x, np.array(
            [[1, 0, 0], [0, 1, v * x.shape[0]], [0, 0, 1]], np.float32))

    # (op, max_v, bias) — randaugment.py fixmatch_augment_pool
    pool = [
        (autocontrast, None, None), (brightness, 0.9, 0.05),
        (color, 0.9, 0.05), (contrast, 0.9, 0.05), (equalize, None, None),
        (identity, None, None), (posterize, 4, 4), (rotate, 30, 0),
        (sharpness, 0.9, 0.05), (shear_x, 0.3, 0), (shear_y, 0.3, 0),
        (solarize, 256, 0), (translate_x, 0.3, 0), (translate_y, 0.3, 0),
    ]
    for op, max_v, bias in [pool[i] for i in rng.randint(0, len(pool), n)]:
        v = None
        if max_v is not None:
            v = float(rng.randint(1, m + 1)) / 10.0 * max_v + bias
            if op in (rotate, shear_x, shear_y, translate_x, translate_y) \
                    and rng.rand() < 0.5:
                v = -v
        img = op(img, v)
    # CutoutAbs(16-ish): fixed-size gray square, always applied last
    h, w = img.shape[:2]
    cut = max(min(h, w) // 2 * 2 // 4, 2)
    cy, cx = rng.randint(0, h), rng.randint(0, w)
    y0, y1 = max(cy - cut // 2, 0), min(cy + cut // 2, h)
    x0, x1 = max(cx - cut // 2, 0), min(cx + cut // 2, w)
    img[y0:y1, x0:x1] = 127
    return img


# ---------------------------------------------------------------------------
# SimCLRv2-style fine-tuning
# ---------------------------------------------------------------------------

def make_finetune_train_step(
    backbone_apply: Callable,    # (params, images) -> (N, D) features
    head_apply: Callable,        # (params, feats) -> (N, C) logits
    optimizer,
    freeze_backbone: bool = False,
):
    """Supervised fine-tuning of a pretrained trunk + classifier head on
    the USL-selected labeled subset (semisup-simclrv2/fine_tune.py:
    FineTuneModel forward :189-203 with optional frozen trunk, CE loss,
    SGD + cosine decay built by the caller)."""

    def step(state, images, targets):
        def loss_fn(params):
            feats = backbone_apply(params["backbone"], images)
            if freeze_backbone:
                feats = jax.lax.stop_gradient(feats)
            logits = head_apply(params["head"], feats)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(
                logp, targets[:, None].astype(jnp.int32), axis=-1))
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == targets).astype(jnp.float32))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        if freeze_backbone:
            grads["backbone"] = jax.tree_util.tree_map(
                jnp.zeros_like, grads["backbone"])
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"])
        import optax

        params = optax.apply_updates(state["params"], updates)
        return dict(state, params=params, opt_state=opt_state), {
            "loss": loss, "top1": acc}

    return jax.jit(step, donate_argnums=(0,))
