"""Fixed-size instance containers as pytrees.

TPU-first counterpart of ``detectron2/structures/instances.py:8``. The
reference's ``Instances`` holds variable-length per-image fields; XLA needs
static shapes, so here every field is padded to a fixed capacity ``N`` with a
boolean ``valid`` mask. Registered as pytrees so they flow through jit/pjit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GtInstances:
    """Ground-truth instances for one image (or batched with leading dim).

    boxes:   (N, 4) XYXY in the *network input* coordinate frame.
    classes: (N,)  int32 contiguous class ids (0..C-1).
    masks:   (N, Hm, Wm) uint8/bool bitmasks at mask supervision resolution,
             or None when training without masks. For memory, these are kept
             at the network input resolution / MASK_DOWNSAMPLE.
    valid:   (N,)  bool.
    """

    boxes: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    masks: Optional[jnp.ndarray] = None
    keypoints: Optional[jnp.ndarray] = None   # (N, Kp, 3) x, y, visibility

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Detections:
    """Model outputs per image: fixed K detections with validity mask.

    boxes:   (K, 4) XYXY in network-input coords (rescale at postprocess).
    scores:  (K,)
    classes: (K,) int32
    valid:   (K,) bool
    mask_logits: (K, M, M) optional per-detection mask logits (M=28).
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    mask_logits: Optional[jnp.ndarray] = None
    keypoints: Optional[jnp.ndarray] = None   # (K, Kp, 4) x, y, logit, prob

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]


def pad_to(x: jnp.ndarray, n: int, axis: int = 0, value=0) -> jnp.ndarray:
    """Pad (or truncate) ``x`` along ``axis`` to length ``n``."""
    cur = x.shape[axis]
    if cur == n:
        return x
    if cur > n:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(x, pad, constant_values=value)
