"""PointRend: point-sampled mask refinement.

Counterpart of ``projects/PointRend`` in the reference (~1.5k LoC):
uncertainty-based point sampling + a point head (MLP over fine-grained +
coarse features) that refines coarse mask logits at adaptively chosen
points. TPU formulation: all point counts are static; sampling uses top-k
uncertainty + random fill, evaluation refines over a fixed number of
subdivision steps with scatter-free one-hot updates.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def point_sample(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (H, W, C) at normalized [0,1] points (P, 2) (x, y)
    — align_corners=False grid_sample semantics (ref point_features.py)."""
    h, w, c = feat.shape
    x = points[:, 0] * w - 0.5
    y = points[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = 0.0
    flat = feat.reshape(h * w, c)
    for dy, wy in ((0, 1 - (y - y0)), (1, y - y0)):
        for dx, wx in ((0, 1 - (x - x0)), (1, x - x0)):
            yy = y0 + dy
            xx = x0 + dx
            inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            lin = (
                jnp.clip(yy, 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            )
            out = out + jnp.take(flat, lin, axis=0) * (wy * wx * inside)[:, None]
    return out


def calculate_uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """-|logit| for binary masks: most uncertain near 0 (ref point_rend)."""
    return -jnp.abs(logits)


def sample_uncertain_points(
    rng: jax.Array,
    coarse_logits: jnp.ndarray,   # (M, M)
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Training-time point selection (ref sampling strategy): oversample
    random points, keep the most uncertain fraction, fill with random."""
    m = coarse_logits.shape[0]
    n_over = int(num_points * oversample_ratio)
    r1, r2 = jax.random.split(rng)
    pts = jax.random.uniform(r1, (n_over, 2))
    unc = calculate_uncertainty(point_sample(
        coarse_logits[..., None], pts
    )[:, 0])
    n_imp = int(num_points * importance_sample_ratio)
    _, top = jax.lax.top_k(unc, n_imp)
    important = pts[top]
    rand = jax.random.uniform(r2, (num_points - n_imp, 2))
    return jnp.concatenate([important, rand], axis=0)


class PointHead(nn.Module):
    """MLP over [fine feature, coarse logit] per point (ref point_head.py)."""

    num_classes: int = 1
    hidden: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
        """fine: (P, C), coarse: (P, K) -> refined logits (P, K)."""
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden, name=f"fc{i}")(x)
            x = nn.relu(x)
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, name="predictor")(x)


def refine_mask_inference(
    point_head_apply,
    fine_feat: jnp.ndarray,       # (H, W, C) per-ROI fine feature
    coarse_logits: jnp.ndarray,   # (M, M) coarse mask logits
    num_steps: int = 2,
    points_per_step: int = 196,
    out_size: int = 56,
) -> jnp.ndarray:
    """Iterative subdivision (ref point_rend inference): upsample, pick the
    most uncertain points, re-predict them with the point head. Scatter is
    expressed as a one-hot matmul so shapes stay static."""
    logits = coarse_logits
    for _ in range(num_steps):
        new_size = min(logits.shape[0] * 2, out_size)
        logits = jax.image.resize(logits, (new_size, new_size), "bilinear")
        flat = logits.reshape(-1)
        unc = calculate_uncertainty(flat)
        k = min(points_per_step, flat.shape[0])
        _, idx = jax.lax.top_k(unc, k)
        ys = (idx // new_size).astype(jnp.float32)
        xs = (idx % new_size).astype(jnp.float32)
        pts = jnp.stack([
            (xs + 0.5) / new_size, (ys + 0.5) / new_size
        ], axis=1)
        fine = point_sample(fine_feat, pts)
        coarse_at = flat[idx][:, None]
        refined = point_head_apply(fine, coarse_at)[:, 0]
        # scatter refined values back (one-hot accumulate)
        onehot = jax.nn.one_hot(idx, flat.shape[0], dtype=flat.dtype)
        flat = flat * (1 - onehot.sum(0)) + refined @ onehot
        logits = flat.reshape(new_size, new_size)
    return logits


def point_rend_mask_loss(
    rng: jax.Array,
    point_head_apply,
    fine_feat: jnp.ndarray,      # (H, W, C)
    coarse_logits: jnp.ndarray,  # (M, M)
    gt_mask_fn,                  # points (P,2) in [0,1] -> (P,) float targets
    num_points: int = 196,
) -> jnp.ndarray:
    """Point-head BCE at uncertainty-sampled points (training)."""
    from u2seg_tpu.ops.losses import bce_with_logits

    pts = sample_uncertain_points(rng, coarse_logits, num_points)
    fine = point_sample(fine_feat, pts)
    coarse = point_sample(coarse_logits[..., None], pts)
    logits = point_head_apply(fine, coarse)[:, 0]
    targets = gt_mask_fn(pts)
    return jnp.mean(bce_with_logits(logits, targets))
