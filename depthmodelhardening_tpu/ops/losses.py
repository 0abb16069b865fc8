"""Photometric / smoothness loss primitives.

Reference:
  * compute_reprojection_loss — monodepth2/trainer.py:525-537
    (0.85 * SSIM + 0.15 * L1, both channel-averaged).
  * get_smooth_loss — layers.py:207-220 (edge-aware first-order smoothness).

The min-reprojection/automask composition lives in training/hardening.py
since it mixes multiple frames and random tie-breaking.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ssim import ssim


def reprojection_loss(pred, target, use_ssim: bool = True):
    """Per-pixel reprojection loss map (B, H, W, 1).

    On TPU the SSIM+L1 composition runs as one fused Pallas kernel
    (ops/pallas_reproj.py); elsewhere as jnp."""
    if not use_ssim:
        return jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    from .pallas_reproj import reprojection_loss_auto

    return reprojection_loss_auto(pred, target)


def smooth_loss(disp, img):
    """Edge-aware smoothness; disp (B,H,W,1), img (B,H,W,C); scalar."""
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True)
    grad_img_y = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)
