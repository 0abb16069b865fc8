"""SSIM loss map, matching the reference implementation exactly.

Reference: DepthNetworks/monodepth2/layers.py:223-253 — reflection-pad 1,
3x3 average pooling for all moments, C1 = 0.01^2, C2 = 0.03^2, output
clamp((1 - SSIM)/2, 0, 1).

TPU notes: the five 3x3 mean pools are expressed as reduce_window sums on
a single stacked tensor so XLA emits one fused windowed reduction; wholly
VPU work that fuses into the surrounding photometric loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _reflect_pad1(x):
    # slice-add pad adjoint (ops/padding.py): XLA's reflect-pad VJP is
    # scatter-grade slow on TPU and this pad sits in the loss backward
    from .padding import reflect_pad1

    return reflect_pad1(x)


def _mean_pool3(x):
    """3x3 valid mean pooling, NHWC."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return s / 9.0


def ssim(x, y):
    """Per-pixel SSIM dissimilarity map.

    Args:
      x, y: (B, H, W, C) images in [0, 1].
    Returns:
      (B, H, W, C) values in [0, 1]: clamp((1 - SSIM)/2, 0, 1).
    """
    x = _reflect_pad1(x)
    y = _reflect_pad1(y)

    # Stack the five moment inputs so the reduce_window runs once.
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    pooled = _mean_pool3(stacked)
    C = x.shape[-1]
    mu_x = pooled[..., 0 * C:1 * C]
    mu_y = pooled[..., 1 * C:2 * C]
    sigma_x = pooled[..., 2 * C:3 * C] - mu_x ** 2
    sigma_y = pooled[..., 3 * C:4 * C] - mu_y ** 2
    sigma_xy = pooled[..., 4 * C:5 * C] - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)
