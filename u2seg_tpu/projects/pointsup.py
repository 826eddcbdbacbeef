"""PointSup: point-supervised instance segmentation.

Counterpart of ``projects/PointSup`` in the reference (point_utils.py,
mask_head.py, config.py, dataset_mapper.py): instead of full mask
supervision, each GT instance carries P annotated points (coords + 0/1
labels); the standard mask head is trained with BCE at those points only.

TPU formulation: point counts are static (P points per instance, fixed
capacity R instances per image); out-of-box and padded points are folded
into a single ignore mask (the reference's label ``-1``) and the loss is
normalized by the number of live points.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from u2seg_tpu.projects.pointrend import point_sample


def get_point_coords_wrt_box(
    boxes: jnp.ndarray,          # (R, 4) XYXY image coords
    point_coords: jnp.ndarray,   # (R, P, 2) image coords (x, y)
) -> jnp.ndarray:
    """Image coords -> box-normalized [0,1]^2 coords (ref point_utils.py:56).

    Degenerate boxes produce coords outside [0,1], which the ignore logic
    downstream drops.
    """
    w = jnp.maximum(boxes[:, None, 2] - boxes[:, None, 0], 1e-6)
    h = jnp.maximum(boxes[:, None, 3] - boxes[:, None, 1], 1e-6)
    x = (point_coords[..., 0] - boxes[:, None, 0]) / w
    y = (point_coords[..., 1] - boxes[:, None, 1]) / h
    return jnp.stack([x, y], axis=-1)


def prepare_point_targets(
    proposal_boxes: jnp.ndarray,  # (R, 4) matched proposal boxes
    gt_point_coords: jnp.ndarray, # (R, P, 2) image coords
    gt_point_labels: jnp.ndarray, # (R, P) in {0, 1}; <0 already means ignore
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Box-normalized coords + labels with out-of-box points ignored
    (ref point_utils.py:7-52: labels of points outside the proposal are
    set to -1)."""
    coords = get_point_coords_wrt_box(proposal_boxes, gt_point_coords)
    outside = (
        (coords[..., 0] < 0.0) | (coords[..., 0] > 1.0)
        | (coords[..., 1] < 0.0) | (coords[..., 1] > 1.0)
    )
    labels = jnp.where(outside, -1.0, gt_point_labels.astype(jnp.float32))
    return coords, labels


def sample_point_annotations(
    rng: jax.Array,
    point_coords: jnp.ndarray,   # (R, P, 2)
    point_labels: jnp.ndarray,   # (R, P)
    num_sample: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """INPUT.SAMPLE_POINTS: keep a random subset of the annotated points
    each iteration (ref dataset_mapper.py); 0/negative = use all points.

    Static output size: returns (R, num_sample, 2)/(R, num_sample).
    """
    r, p, _ = point_coords.shape
    if num_sample <= 0 or num_sample >= p:
        return point_coords, point_labels
    noise = jax.random.uniform(rng, (r, p))
    _, idx = jax.lax.top_k(noise, num_sample)            # random w/o replacement
    take = lambda a: jnp.take_along_axis(a, idx, axis=1)
    coords = jnp.stack(
        [take(point_coords[..., 0]), take(point_coords[..., 1])], axis=-1
    )
    return coords, take(point_labels)


def annotations_to_point_arrays(
    annos, capacity: int, points_per_instance: int,
):
    """Dataset-side helper (ref detection_utils.py annotations_to_instances
    + register_point_annotations.py): read ``point_coords``/``point_labels``
    from COCO-with-points annotation dicts into fixed-capacity numpy arrays
    (pad instances to ``capacity`` rows, points to ``points_per_instance``
    per row; padded points carry label -1 = ignore)."""
    import numpy as np_

    coords = np_.zeros((capacity, points_per_instance, 2), np_.float32)
    labels = np_.full((capacity, points_per_instance), -1.0, np_.float32)
    for i, ann in enumerate(annos[:capacity]):
        pc = np_.asarray(ann.get("point_coords", []), np_.float32).reshape(-1, 2)
        pl = np_.asarray(ann.get("point_labels", []), np_.float32).reshape(-1)
        n = min(len(pl), points_per_instance)
        coords[i, :n] = pc[:n]
        labels[i, :n] = pl[:n]
    return coords, labels


def point_sup_mask_loss(
    mask_logits: jnp.ndarray,    # (R, M, M, K) per-class mask logits
    gt_classes: jnp.ndarray,     # (R,) int32
    point_coords: jnp.ndarray,   # (R, P, 2) box-normalized [0,1]^2 (x, y)
    point_labels: jnp.ndarray,   # (R, P) {0,1}, <0 = ignore
    valid: jnp.ndarray,          # (R,) instance validity (fg & unpadded)
) -> jnp.ndarray:
    """BCE at annotated points (ref mask_head.py:31-66 + point_rend's
    roi_mask_point_loss): sample the gt-class mask logit at each point,
    average BCE over non-ignored points of valid instances."""
    r, m, _, k = mask_logits.shape
    cls = jnp.clip(gt_classes, 0, k - 1)
    per_cls = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=-1
    )[..., 0]                                             # (R, M, M)
    logits = jax.vmap(
        lambda f, p: point_sample(f[..., None], p)[:, 0]
    )(per_cls.astype(jnp.float32), point_coords)          # (R, P)

    live = (point_labels >= 0) & valid[:, None]
    tgt = jnp.clip(point_labels, 0.0, 1.0)
    per_point = jnp.maximum(logits, 0) - logits * tgt + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    denom = jnp.maximum(jnp.sum(live), 1.0)
    return jnp.sum(per_point * live) / denom
