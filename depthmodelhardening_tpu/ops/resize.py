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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import bilinear_sample_pixels

_F32 = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix for the torch
    half-pixel convention: src = (dst + 0.5) * (in/out) - 0.5, edge
    clamped. Each row has at most two non-zeros (1-frac, frac)."""
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float64)
    M = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    M[rows, lo] += (1.0 - frac).astype(np.float32)
    M[rows, hi] += frac.astype(np.float32)
    return M


def bilinear_resize(img, out_h: int, out_w: int):
    """torch F.interpolate(mode="bilinear", align_corners=False, antialias=False).

    img: (B, H, W, C) -> (B, out_h, out_w, C).

    TPU-first: the sampling grid is static and separable, so the resize
    is two small dense matmuls (out = R_h @ img @ R_w^T) that run on the
    MXU instead of per-pixel gathers — the reference's composite-resize
    (1242x375 -> 1024x320 each attack step, phy_obj_atk.py:51, 89) is
    gather-bound otherwise. Interpolation matrices are compile-time
    constants; numerics match the gather path to float rounding.
    """
    B, H, W, C = img.shape
    if H == out_h and W == out_w:
        return img
    Rh = jnp.asarray(_interp_matrix(H, out_h), img.dtype)  # (out_h, H)
    Rw = jnp.asarray(_interp_matrix(W, out_w), img.dtype)  # (out_w, W)
    # (B,H,W,C) -> (B,out_h,W,C) -> (B,out_h,out_w,C)
    tmp = jnp.einsum("oh,bhwc->bowc", Rh, img, precision=_F32)
    return jnp.einsum("ow,bhwc->bhoc", Rw, tmp, precision=_F32)


def _up2_raw(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=1)


@jax.custom_vjp
def nearest_upsample2(x):
    """2x nearest-neighbor upsample, NHWC (layers.py:201-204 equivalent).

    For integer factor 2, torch's "nearest" is an exact repeat. Forward
    uses jnp.repeat — measured ~3x faster than the broadcast-reshape
    form on TPU at decoder shapes (the broadcast interleaves W in the
    sublane dimension; scripts/bench_upsample.py). The backward is the
    exact transpose (2x2 window sum), pinned via custom_vjp because
    repeat's autodiff is the slower path.
    """
    return _up2_raw(x)


def _up2_fwd(x):
    return _up2_raw(x), None


def _up2_bwd(_, g):
    B, H2, W2, C = g.shape
    return (g.reshape(B, H2 // 2, 2, W2 // 2, 2, C).sum((2, 4)),)


nearest_upsample2.defvjp(_up2_fwd, _up2_bwd)


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
