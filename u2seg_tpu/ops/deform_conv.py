"""Deformable convolution v1/v2 (gather-based JAX formulation).

Counterpart of the reference's ``csrc/deformable/`` CUDA kernels
(deform_conv_cuda*.cu, ~2.5k LoC: im2col with learned offsets) and the
Python wrappers in ``detectron2/layers/deform_conv.py`` (DeformConv,
ModulatedDeformConv).

TPU design: deformable im2col = bilinear gather of K*K sampled patches at
(grid + learned offset) positions, then a dense matmul with the weights —
the gather is XLA-native and the matmul lands on the MXU. Autodiff gives
the backward pass (scatter-add for features, analytic for offsets) so no
hand-written backward kernels are needed.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_gather(feats: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """feats: (H, W, C); ys/xs: (...,) sample coords. Zero outside."""
    h, w, c = feats.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    out = 0.0
    flat = feats.reshape(h * w, c)
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yy = y0 + dy
            xx = x0 + dx
            inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            lin = (
                jnp.clip(yy, 0, h - 1).astype(jnp.int32) * w
                + jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            )
            v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(lin.shape + (c,))
            out = out + v * (wy * wx * inside)[..., None]
    return out


def deform_conv2d(
    x: jnp.ndarray,            # (B, H, W, Cin)
    offsets: jnp.ndarray,      # (B, Ho, Wo, 2*K*K) — (dy, dx) per tap
    weight: jnp.ndarray,       # (K, K, Cin, Cout)
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask: Optional[jnp.ndarray] = None,  # (B, Ho, Wo, K*K) modulation (v2)
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deformable conv forward. Output (B, Ho, Wo, Cout) with
    Ho = (H + 2p - d*(K-1) - 1)//s + 1."""
    b, h, w, cin = x.shape
    k = weight.shape[0]
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1

    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(
        jnp.arange(k) * dilation, jnp.arange(k) * dilation, indexing="ij"
    )
    base_y = oy[:, None, None] + ky.reshape(-1)[None, None, :]   # (Ho,1,KK)
    base_x = ox[None, :, None] + kx.reshape(-1)[None, None, :]   # (1,Wo,KK)

    off = offsets.reshape(b, ho, wo, k * k, 2)
    ys = base_y[None, :, :, :] + off[..., 0]
    xs = base_x[None, :, :, :] + off[..., 1]

    def per_image(feats, ys_i, xs_i, mask_i):
        sampled = _bilinear_gather(feats, ys_i, xs_i)   # (Ho, Wo, KK, Cin)
        if mask_i is not None:
            sampled = sampled * mask_i[..., None]
        return sampled

    if mask is not None:
        m = mask.reshape(b, ho, wo, k * k)
        sampled = jax.vmap(per_image)(x, ys, xs, m)
    else:
        sampled = jax.vmap(lambda f, y_, x_: per_image(f, y_, x_, None))(
            x, ys, xs
        )
    # (B, Ho, Wo, KK*Cin) @ (KK*Cin, Cout)
    out = sampled.reshape(b, ho, wo, k * k * cin) @ weight.reshape(
        k * k * cin, -1
    )
    if bias is not None:
        out = out + bias
    return out


class DeformConv(nn.Module):
    """v1: offsets from a plain conv branch (ref deform_conv.py DeformConv)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, offsets=None):
        k = self.kernel_size
        if offsets is None:
            offsets = nn.Conv(
                2 * k * k, (k, k), strides=self.stride,
                padding=[(self.padding,) * 2] * 2,
                kernel_init=nn.initializers.zeros, name="offset_conv",
            )(x)
        weight = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, x.shape[-1], self.features),
        )
        return deform_conv2d(
            x, offsets, weight, self.stride, self.padding, self.dilation
        )


class ModulatedDeformConv(nn.Module):
    """v2: offsets + sigmoid modulation mask (ref ModulatedDeformConv)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        om = nn.Conv(
            3 * k * k, (k, k), strides=self.stride,
            padding=[(self.padding,) * 2] * 2,
            kernel_init=nn.initializers.zeros, name="offset_mask_conv",
        )(x)
        offsets = om[..., : 2 * k * k]
        mask = jax.nn.sigmoid(om[..., 2 * k * k:]) * 2.0
        weight = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(
            x, offsets, weight, self.stride, self.padding, self.dilation,
            mask=mask, bias=bias,
        )
