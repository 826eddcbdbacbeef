"""Normalization layers.

Counterpart of ``detectron2/layers/batch_norm.py`` (FrozenBatchNorm2d :13,
NaiveSyncBatchNorm :200, LayerNorm :333) and the ``get_norm`` factory (:143).

TPU notes: SyncBN is *free* in SPMD — ``flax.linen.BatchNorm`` with
``axis_name='data'`` psums batch moments across the mesh inside the compiled
step (exactly what NaiveSyncBatchNorm emulates with hand-rolled all_reduce).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed affine + statistics (never updated, no gradient).

    Matches ref FrozenBatchNorm2d (batch_norm.py:13-142): out =
    (x - mean) / sqrt(var + eps) * weight + bias with all four as constants.
    Channels-last.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        ).value
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        # fold in f32, apply in the activation dtype: keeps the affine a
        # fusable epilogue of the producing conv instead of an f32 round trip
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class BatchNorm(nn.BatchNorm):
    """flax BatchNorm whose inference path applies the folded affine.

    NOTE the class is named ``BatchNorm`` so flax auto-names submodule
    scopes exactly like ``nn.BatchNorm`` (``BatchNorm_0`` ...) — checkpoint
    variable paths and the torch weight converter are name-compatible.

    flax's BatchNorm computes ``(x - mean) * rsqrt(var + eps) * scale +
    bias`` with f32 broadcasts even when ``use_running_average=True``; on
    TPU the f32 body blocks fusion into the producing conv's epilogue and
    costs a ~0.4 ms layout copy per call site at detection resolutions.
    Folding mean/var/scale/bias into one per-channel (mul, add) in f32 and
    applying in the activation dtype is the same math to 1 ulp and fuses
    cleanly (identical to FrozenBatchNorm's application). Training behavior
    (batch stats, psum sync via axis_name, running-average updates) is
    inherited unchanged, and variable/param names, shapes and creation
    order match flax exactly, so checkpoints interoperate.
    """

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average,
        )
        if not use_ra:
            return super().__call__(x, use_running_average=False)
        feature_shape = (x.shape[-1],)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), feature_shape,
        ).value
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), feature_shape,
        ).value
        mul = jax.lax.rsqrt(ra_var + self.epsilon)
        if self.use_scale:
            mul = mul * self.param(
                "scale", self.scale_init, feature_shape, self.param_dtype
            )
        add = -ra_mean * mul
        if self.use_bias:
            add = add + self.param(
                "bias", self.bias_init, feature_shape, self.param_dtype
            )
        # dtype=None means "promote to f32" (flax BatchNorm's canonicalized
        # default) — match it so train and eval agree; bf16 output only
        # when the caller asked for it explicitly.
        dtype = (self.dtype if self.dtype is not None
                 else jnp.promote_types(x.dtype, jnp.float32))
        return x.astype(dtype) * mul.astype(dtype) + add.astype(dtype)


def get_norm(
    norm: Optional[str],
    features: int,
    *,
    axis_name: str = "data",
    dtype: Optional[jnp.dtype] = None,
) -> Optional[nn.Module]:
    """Norm factory mirroring ref layers/batch_norm.py:143 ``get_norm``.

    "BN"      -> per-replica BatchNorm (no cross-device sync)
    "SyncBN"  -> BatchNorm synced over the ``data`` mesh axis (psum of moments)
    "FrozenBN"-> FrozenBatchNorm
    "GN"      -> GroupNorm(32)
    "LN"      -> LayerNorm over channels
    "" / None -> None
    """
    if not norm:
        return None
    # ``dtype`` is the activation/result dtype (None = promote to f32, the
    # conservative default). Statistics are always f32: flax's
    # _compute_stats force-promotes reductions, so bf16 outputs are safe —
    # and keep the norm a fusable epilogue instead of an f32 HBM round trip.
    if norm == "BN":
        return BatchNorm(momentum=0.9, epsilon=1e-5,
                         use_running_average=None, dtype=dtype)
    if norm in ("SyncBN", "naiveSyncBN"):
        return BatchNorm(
            momentum=0.9, epsilon=1e-5, axis_name=axis_name,
            use_running_average=None, dtype=dtype,
        )
    if norm == "FrozenBN":
        return FrozenBatchNorm(features)
    if norm in ("BNBatchStats", "SyncBNBatchStats"):
        from u2seg_tpu.projects.rethinking_bn import BatchNormBatchStats

        return BatchNormBatchStats(
            axis_name=axis_name if norm.startswith("Sync") else None
        )
    if norm == "GN":
        import math

        groups = 32 if features % 32 == 0 else math.gcd(32, features)
        return nn.GroupNorm(num_groups=max(groups, 1), epsilon=1e-5,
                            dtype=dtype)
    if norm == "LN":
        return nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    raise ValueError(f"Unknown norm: {norm}")


# explicit alias for importers
FoldedInferenceBatchNorm = BatchNorm
