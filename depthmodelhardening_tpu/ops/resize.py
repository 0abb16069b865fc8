"""Image resizing matching torch's F.interpolate conventions exactly.

The reference resizes composited scenes 1242x375 -> 1024x320 with
torchvision Resize (bilinear, align_corners=False, NO antialiasing —
e.g. torchattacks/attacks/phy_obj_atk.py:51, 89) and upsamples decoder
features with mode="nearest" (layers.py:201-204). jax.image.resize applies
an antialiasing kernel when downsampling, so we implement the torch
half-pixel bilinear directly on top of our gather sampler to match the
reference bit-for-bit-in-convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import bilinear_sample_pixels


def bilinear_resize(img, out_h: int, out_w: int):
    """torch F.interpolate(mode="bilinear", align_corners=False, antialias=False).

    img: (B, H, W, C) -> (B, out_h, out_w, C).
    src = (dst + 0.5) * (in/out) - 0.5, edge-clamped bilinear.
    """
    B, H, W, C = img.shape
    if H == out_h and W == out_w:
        return img
    sy = H / out_h
    sx = W / out_w
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    x = jnp.broadcast_to(xs[None, None, :], (B, out_h, out_w))
    y = jnp.broadcast_to(ys[None, :, None], (B, out_h, out_w))
    return bilinear_sample_pixels(img, x, y, padding_mode="border")


def nearest_upsample2(x):
    """2x nearest-neighbor upsample, NHWC (layers.py:201-204 equivalent).

    For integer factor 2, torch's "nearest" is an exact repeat, which XLA
    lowers to a cheap broadcast-reshape (no gather).
    """
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def nearest_resize(img, out_h: int, out_w: int):
    """torch F.interpolate(mode="nearest"): src_idx = floor(dst * in/out)."""
    B, H, W, C = img.shape
    if H == out_h and W == out_w:
        return img
    iy = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    return img[:, iy][:, :, ix]
