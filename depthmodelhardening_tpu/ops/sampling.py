"""Bilinear grid sampling for NHWC images (jnp gather based).

TPU-native replacement for the two native samplers the reference delegates
to PyTorch/CUDA:
  * F.grid_sample(..., padding_mode="border", align_corners=True) used by
    the reprojection warp (DepthNetworks/monodepth2/trainer.py:515-519),
  * the zero-filled bilinear resampling inside
    torchvision.transforms.functional.perspective (physicalTrans.py:141).

Implementation: 4 flat gathers (take_along_axis over H*W) + a weighted sum.
All shapes static; differentiable w.r.t. both image and grid; works under
vmap/jit/pjit. A fused Pallas kernel can replace the gathers later without
changing this interface.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img, ix, iy):
    """Gather img[b, iy, ix, :] with integer index maps.

    img: (B, H, W, C); ix/iy: (B, Ho, Wo) int32 already in-range.
    Returns (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    _, Ho, Wo = ix.shape
    flat = img.reshape(B, H * W, C)
    idx = (iy * W + ix).reshape(B, Ho * Wo, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(B, Ho, Wo, C)


def bilinear_sample_pixels(img, x, y, padding_mode: str = "border"):
    """Bilinear sample at pixel coordinates (x, y).

    Args:
      img: (B, H, W, C).
      x, y: (B, Ho, Wo) float pixel coordinates (0..W-1 / 0..H-1 in-range).
      padding_mode: "border" clamps coordinates (torch grid_sample border
        semantics); "zeros" gives out-of-range neighbors zero contribution.
    Returns:
      (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    compute_dtype = img.dtype

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(compute_dtype)[..., None]
    wy = (y - y0f).astype(compute_dtype)[..., None]

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        # Per-neighbor validity, torch zero-padding semantics.
        vx0 = (x0 >= 0) & (x0 <= W - 1)
        vx1 = (x1 >= 0) & (x1 <= W - 1)
        vy0 = (y0 >= 0) & (y0 <= H - 1)
        vy1 = (y1 >= 0) & (y1 <= H - 1)
        m00 = (vx0 & vy0).astype(compute_dtype)[..., None]
        m01 = (vx1 & vy0).astype(compute_dtype)[..., None]
        m10 = (vx0 & vy1).astype(compute_dtype)[..., None]
        m11 = (vx1 & vy1).astype(compute_dtype)[..., None]
    else:
        m00 = m01 = m10 = m11 = None

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    v00 = _gather_2d(img, x0c, y0c)
    v01 = _gather_2d(img, x1c, y0c)
    v10 = _gather_2d(img, x0c, y1c)
    v11 = _gather_2d(img, x1c, y1c)

    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy

    if padding_mode == "zeros":
        w00, w01, w10, w11 = w00 * m00, w01 * m01, w10 * m10, w11 * m11

    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_sample_rows_tri(img, x, precision_dtype=jnp.float32):
    """Row-aligned bilinear sample, triangular-weight formulation:
    out[b,h,xo,:] interpolates img[b,h,:,:] at column x[b,h,xo]
    (border clamp).

    The rectified-stereo reprojection warp samples each target row
    from the SAME source row (pure x-translation extrinsic), so the
    2-D grid_sample collapses to this 1-D horizontal resample. The
    generic 4-tap flat-index gather lowers element-wise on TPU
    (~365 ms per warp at batch 32, 320x1024 — it dominated the full
    hardening step); this formulation builds the two-tap triangular
    weight row w[xo, j] = max(0, 1 - |x[xo] - j|) and contracts it
    with the source row on the MXU (XLA fuses the weight generator
    into the dot — the (W, W) weights never reach HBM). Measured
    12.4 ms fwd / ~35 ms fwd+grads (scripts/bench_hwarp.py), values
    bit-equal to the gather path. SUPERSEDED as the default by the
    one-hot formulation below (bilinear_sample_rows), which halves
    the VPU weight-generation work that walls this one; kept for
    parity testing.

    Differentiable w.r.t. img (exact transposed contraction) and x
    (sum_j dtri/dx * img[j] = the standard bilinear coordinate
    gradient, zero where x is clamped outside [0, W-1] — matching
    autodiff-through-clip up to measure-zero boundary ties).
    """
    out, _ = _bsr_fwd(img, x, precision_dtype)
    return out


def _bsr_weights(x, W, dtype, precision_dtype):
    xc = jnp.clip(x.astype(precision_dtype), 0.0, W - 1)
    js = jnp.arange(W, dtype=precision_dtype)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(xc[..., None] - js)).astype(dtype)


def _bsr_fwd(img, x, precision_dtype):
    W = img.shape[2]
    w = _bsr_weights(x, W, img.dtype, precision_dtype)
    out = jnp.einsum("bhxj,bhjc->bhxc", w, img,
                     preferred_element_type=precision_dtype
                     ).astype(img.dtype)
    return out, (img, x)


def _bsr_bwd(precision_dtype, res, g):
    img, x = res
    W = img.shape[2]
    pd = precision_dtype
    xc = jnp.clip(x.astype(pd), 0.0, W - 1)
    js = jnp.arange(W, dtype=pd)
    d = xc[..., None] - js
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(img.dtype)
    # d tri(d)/d x = -sign(d) on |d| < 1 (0 at d = 0 and outside)
    dw = jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0
                   ).astype(img.dtype)
    d_img = jnp.einsum("bhxj,bhxc->bhjc", w, g,
                       preferred_element_type=pd).astype(img.dtype)
    gi = jnp.einsum("bhxj,bhjc->bhxc", dw, img,
                    preferred_element_type=pd)
    d_x = jnp.sum(gi * g.astype(pd), axis=-1)
    # clip transpose: no coordinate gradient outside the frame
    d_x = jnp.where((x >= 0) & (x <= W - 1), d_x, 0.0)
    return d_img, d_x.astype(x.dtype)


bilinear_sample_rows_tri.defvjp(_bsr_fwd, _bsr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_sample_rows(img, x, precision_dtype=jnp.float32):
    """Row-aligned bilinear sample, one-hot formulation (the default):
    out[b,h,xo,:] interpolates img[b,h,:,:] at column x[b,h,xo]
    (border clamp). Same contract as bilinear_sample_rows_tri.

    Profiling the triangular-weight path shows its wall is the VPU
    weight GENERATION, not the MXU contraction: tri(xc - j) over the
    (B,H,Xo,W) grid costs ~4 VPU ops/element (~11 ms at batch 32,
    320x1024 — scripts/bench_hwarp2.py: transposing the contraction
    to fill the output lanes moved nothing, 12.1 -> 11.6 ms, because
    both orientations idle on the generator). This formulation cuts
    the generator to ONE compare per element and feeds the MXU a
    lane-full contraction:

      i = clip(floor(xc), 0, W-2), frac = xc - i
      oh[j, xo] = (i[xo] == j)              (one equality -> 0/1)
      a  = src6^T @ oh^T, src6 = [img, img_next] channel-concat
           (img_next[j] = img[min(j+1, W-1)])
      out = a[:C] * (1-frac) + a[C:] * frac  (exact two-tap lerp)

    The contraction runs transposed — (2C, W) @ (W, Xo) per row — so
    the Xo=W output columns fill the 128 MXU lanes and 2C=6 rides the
    8-sublane M dim (the shipped orientation padded Cout=3 -> 128
    lanes, a 42x executed-FLOP waste that the generator wall hid).
    The lerp happens AFTER the matmul in precision_dtype, on exact
    0/1-gathered taps — numerically at least as close to the gather
    reference as the tri path (whose weights round to the image dtype
    before the dot).

    Custom VJP: d_img reuses the regenerated one-hot in the same
    transposed orientation (d_src6^T = [g*(1-frac), g*frac]^T @ oh^T,
    lanes = W); d_x = sum_c (a[C:] - a[:C]) * g reuses the FORWARD
    residual `a` — no weight regeneration and no matmul at all, where
    the tri backward paid a second generator pass (dtri) plus a
    padded-lane contraction. Zero outside [0, W-1] (clip transpose),
    and a[C:] - a[:C] is the right-derivative at integer xc (the tri
    path emits 0 there — a measure-zero subgradient choice).
    """
    out, _ = _bsr1_fwd(img, x, precision_dtype)
    return out


def _bsr1_parts(x, W, precision_dtype):
    xc = jnp.clip(x.astype(precision_dtype), 0.0, W - 1)
    i = jnp.clip(jnp.floor(xc), 0.0, W - 2)
    return i, xc - i  # frac in [0, 1]


def _bsr1_onehot(i, W, dtype, precision_dtype):
    js = jnp.arange(W, dtype=precision_dtype)
    # (B, H, W, Xo): ohT[j, xo] = (i[xo] == j)
    return (i[..., None, :] == js[..., :, None]).astype(dtype)


def _bsr1_prec(img):
    # the one-hot operand is exactly representable at any precision;
    # DEFAULT (bf16-pass) matmul precision would truncate an f32
    # image's taps, so f32 callers get the full-precision passes
    return ("highest" if img.dtype == jnp.float32 else None)


def _bsr1_fwd(img, x, precision_dtype):
    B, H, W, C = img.shape
    pd = precision_dtype
    i, frac = _bsr1_parts(x, W, pd)
    ohT = _bsr1_onehot(i, W, img.dtype, pd)
    src6 = jnp.concatenate(
        [img, jnp.concatenate([img[:, :, 1:], img[:, :, W - 1:W]],
                              axis=2)], axis=-1)
    a = jnp.einsum("bhcj,bhjx->bhcx", jnp.swapaxes(src6, 2, 3), ohT,
                   preferred_element_type=pd,
                   precision=_bsr1_prec(img))
    a = jnp.swapaxes(a, 2, 3)  # (B, H, Xo, 2C), pd
    out = (a[..., :C] * (1.0 - frac[..., None])
           + a[..., C:] * frac[..., None]).astype(img.dtype)
    return out, (img, x, a.astype(img.dtype))


def _bsr1_bwd(precision_dtype, res, g):
    img, x, a = res
    B, H, W, C = img.shape
    pd = precision_dtype
    i, frac = _bsr1_parts(x, W, pd)
    ohT = _bsr1_onehot(i, W, img.dtype, pd)
    gq = jnp.concatenate([g.astype(pd) * (1.0 - frac[..., None]),
                          g.astype(pd) * frac[..., None]],
                         axis=-1).astype(img.dtype)  # (B,H,Xo,2C)
    d6 = jnp.einsum("bhcx,bhjx->bhcj", jnp.swapaxes(gq, 2, 3), ohT,
                    preferred_element_type=pd,
                    precision=_bsr1_prec(img))
    d6 = jnp.swapaxes(d6, 2, 3)  # (B, H, W, 2C), pd
    d_next = d6[..., C:]
    # src6[:, j, C:] = img[min(j+1, W-1)]: shift right, and row W-2's
    # AND row W-1's next-taps both land on img[W-1]
    d_img = d6[..., :C]
    d_img = d_img + jnp.concatenate(
        [jnp.zeros_like(d_next[:, :, :1]), d_next[:, :, :W - 1]],
        axis=2)
    d_img = d_img.at[:, :, W - 1].add(d_next[:, :, W - 1])
    d_x = jnp.sum((a[..., C:].astype(pd) - a[..., :C].astype(pd))
                  * g.astype(pd), axis=-1)
    d_x = jnp.where((x >= 0) & (x <= W - 1), d_x, 0.0)
    return d_img.astype(img.dtype), d_x.astype(x.dtype)


bilinear_sample_rows.defvjp(_bsr1_fwd, _bsr1_bwd)


def grid_sample_rows(img, grid_x, align_corners: bool = True):
    """grid_sample specialization for row-aligned warps: grid_x is the
    normalized x coordinate (B, Ho, Wo) in [-1, 1]; each output row
    samples its own source row (border padding)."""
    W = img.shape[2]
    if align_corners:
        x = (grid_x + 1.0) * 0.5 * (W - 1)
    else:
        x = ((grid_x + 1.0) * W - 1.0) * 0.5
    return bilinear_sample_rows(img, x)


def grid_sample(img, grid, padding_mode: str = "border",
                align_corners: bool = True):
    """torch.nn.functional.grid_sample (bilinear) for NHWC images.

    Args:
      img: (B, H, W, C).
      grid: (B, Ho, Wo, 2) normalized coords in [-1, 1], last dim (x, y).
      padding_mode: "border" | "zeros".
      align_corners: torch convention for unnormalization.
    Returns:
      (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return bilinear_sample_pixels(img, x, y, padding_mode=padding_mode)
