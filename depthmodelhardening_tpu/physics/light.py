"""Physical light simulation, jit/vmap-compatible.

Re-design of torchattacks/attacks/light_simulation.py: the reference
builds light patterns with per-pixel Python loops + scipy/cv2 on host;
here every generator is a closed-form jnp expression of *traced*
parameters, so the light-attack search loop (8000 candidate patterns,
phy_obj_atk_light.py:113-167) compiles into a single on-device loop.

  * wavelength_to_rgb  — light_simulation.py:39-86 (piecewise visible-
    spectrum mapping, gamma 0.8), re-expressed branchlessly.
  * tube_light_by_func — light_simulation.py:124-163: distance of each
    pixel to the line y = k*x + b, full intensity within sqrt(beta),
    beta/d^2 attenuation out to sqrt(20*beta).
  * area_light         — light_simulation.py:87-121 (left-direction
    column attenuation; rotations handled by transpose/flip).
  * simple_add         — light_simulation.py:23-28 (addWeighted in
    [0,255] space), with the reference's uint8 round trip replicated as
    floor-quantization.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_pow(base, exp):
    return jnp.power(jnp.maximum(base, 0.0), exp)


def wavelength_to_rgb(wavelength, gamma: float = 0.8):
    """Traced wavelength (nm) -> (R, G, B) in [0, 1]."""
    w = jnp.asarray(wavelength, jnp.float32)

    def band(lo, hi):
        return (w >= lo) & (w <= hi)

    att1 = 0.3 + 0.7 * (w - 380.0) / 60.0
    att6 = 0.3 + 0.7 * (750.0 - w) / 105.0

    R = jnp.where(band(380, 440), _safe_pow(-(w - 440) / 60.0 * att1, gamma),
        jnp.where(band(440, 510), 0.0,
        jnp.where(band(510, 580), _safe_pow((w - 510) / 70.0, gamma),
        jnp.where(band(580, 645), 1.0,
        jnp.where(band(645, 750), _safe_pow(att6, gamma), 0.0)))))
    G = jnp.where(band(440, 490), _safe_pow((w - 440) / 50.0, gamma),
        jnp.where(band(490, 580), jnp.where(band(510, 580), 1.0, 1.0),
        jnp.where(band(580, 645), _safe_pow(-(w - 645) / 65.0, gamma),
                  0.0)))
    G = jnp.where(band(380, 440), 0.0, G)
    B = jnp.where(band(380, 440), _safe_pow(att1, gamma),
        jnp.where(band(440, 490), 1.0,
        jnp.where(band(490, 510), _safe_pow(-(w - 510) / 20.0, gamma),
                  0.0)))
    return R, G, B


def tube_light_by_func(k, b, alpha, beta, wavelength, w: int, h: int):
    """Tube light (beam along y = k*x + b) of shape (h, w, 3).

    k, b, alpha, beta, wavelength are traced scalars; w/h static.
    Matches light_simulation.py:124-163 including the int(sqrt+0.5)
    truncations.
    """
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    dist = jnp.abs(k * xs - ys + b) / jnp.sqrt(1.0 + k * k)

    full_end = jnp.trunc(jnp.sqrt(beta) + 0.5)
    light_end = jnp.trunc(jnp.sqrt(beta * 20.0) + 0.5)

    atten = jnp.where(
        dist <= full_end, 1.0,
        jnp.where(dist <= light_end,
                  beta / jnp.maximum(dist * dist, 1e-12), 0.0))
    R, G, B = wavelength_to_rgb(wavelength)
    color = jnp.stack([R, G, B]) * alpha
    return atten[..., None] * color[None, None, :]


def area_light(alpha, beta, wavelength, w: int = 150, h: int = 150,
               direction: str = "left"):
    """Area light, shape (h, w, 3): full intensity out to sqrt(beta)
    columns, beta/x^2 beyond (light_simulation.py:87-121). The rotations
    use exact transposes instead of ndimage.rotate."""
    full_end = jnp.trunc(jnp.sqrt(beta) + 0.5)

    def atten1d(n):
        t = jnp.arange(n, dtype=jnp.float32)
        return jnp.where(t < full_end, 1.0,
                         beta / jnp.maximum(t * t, 1e-12))

    R, G, B = wavelength_to_rgb(wavelength)
    color = jnp.stack([R, G, B]) * alpha
    if direction in ("left", "right"):
        a = atten1d(w)
        if direction == "right":
            a = a[::-1]
        plane = a[None, :, None]
    elif direction in ("top", "bottom"):
        a = atten1d(h)
        if direction == "bottom":
            a = a[::-1]
        plane = a[:, None, None]
    else:
        raise ValueError(direction)
    return jnp.broadcast_to(plane * color[None, None, :], (h, w, 3))


def tube_light_generation(angle, alpha, beta, wavelength,
                          w: int = 400, h: int = 400):
    """Angle-form tube light (light_simulation.py:164-217), shape (h,w,3).

    The reference builds horizontal bands row by row — full intensity
    in rows [light_end, total_dist], beta/d^2 attenuation flanks (its
    write order makes row total_dist attenuated, replicated here) —
    then applies scipy ndimage.rotate(angle, reshape=False). Here the
    bands are a closed-form row map and the rotation an inverse-rotation
    bilinear resample about the image center (the reference's cubic
    spline differs sub-pixel; oracle-tested against order=1 rotate).
    Note the reference uses sqrt(beta*10) here, unlike the *20 of the
    by-func variant.
    """
    full_end = jnp.trunc(jnp.sqrt(beta) + 0.5)
    light_end = jnp.trunc(jnp.sqrt(beta * 10.0) + 0.5)
    total_dist = light_end + full_end

    r = jnp.arange(h, dtype=jnp.float32)
    d_low = total_dist - r
    d_high = r - light_end
    att = jnp.where(
        r <= light_end, beta / jnp.maximum(d_low * d_low, 1e-12),
        jnp.where(r < total_dist, 1.0,
                  jnp.where(r <= total_dist + light_end,
                            beta / jnp.maximum(d_high * d_high, 1e-12),
                            0.0)))
    R, G, B = wavelength_to_rgb(wavelength)
    color = jnp.stack([R, G, B]) * alpha
    pattern = att[:, None, None] * color[None, None, :]
    pattern = jnp.broadcast_to(pattern, (h, w, 3))
    return _rotate_image(pattern, angle)


def _rotate_image(img, angle_deg):
    """ndimage.rotate(reshape=False, cval=0) equivalent: inverse-rotate
    output pixel coords about the center, bilinear zero-fill sample.
    img: (H, W, C); angle traced scalar in degrees."""
    from ..ops.sampling import bilinear_sample_pixels

    H, W = img.shape[:2]
    th = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(th), jnp.sin(th)
    # matches scipy's direction (oracle-tested): the inverse map
    # rotates output coords by +angle in (row, col) space
    sy = cos * ys + sin * xs + cy
    sx = -sin * ys + cos * xs + cx
    sy = jnp.broadcast_to(sy, (H, W))
    sx = jnp.broadcast_to(sx, (H, W))
    out = bilinear_sample_pixels(img[None], sx[None], sy[None],
                                 padding_mode="zeros")[0]
    # scipy mode="constant": coords outside the input extent give cval
    # outright (no partial interpolation against the fill value)
    valid = ((sy >= 0) & (sy <= H - 1) & (sx >= 0) & (sx <= W - 1))
    return out * valid[..., None].astype(out.dtype)


def point_light_generation(st, alpha, beta, wavelength,
                           w: int = 400, h: int = 400):
    """Point light — the reference is an unimplemented stub returning a
    zero pattern (light_simulation.py:221-243); replicated verbatim for
    module-surface parity."""
    del st, alpha, beta, wavelength
    return jnp.zeros((h, w, 3), jnp.float32)


def gaussian_add(base_img, light_pattern, rng, eps: float = 128 / 255.0):
    """Pattern-modulated Gaussian noise (light_simulation.py:30-38) in
    [0,1] space: noise ~ N(0,1) per pixel, scaled by eps * pattern and
    clipped to [-eps, eps]; added WITHOUT clamping the result, like the
    reference. eps defaults to the reference's 128 (on 0..255) mapped
    to [0,1]. base_img (..., H, W, 3); light_pattern (H, W, 3) in [0,1];
    rng: jax PRNG key (replaces np.random.normal).
    """
    import jax

    s = jax.random.normal(rng, base_img.shape, jnp.float32)
    g = jnp.clip(s * eps * light_pattern, -eps, eps)
    return base_img + g


def simple_add(base_img, light_pattern, alpha=1.0,
               quantize: bool = True):
    """Additive composite in [0,1] space; the reference operates on
    [0,255] uint8 and re-tensors (phy_obj_atk_light.py:133-144), which
    quantizes — replicated via floor to 1/255 steps.

    base_img: (..., H, W, 3) in [0,1]; light_pattern (H, W, 3) in [0,1].
    """
    out = jnp.clip(base_img + alpha * light_pattern, 0.0, 1.0)
    if quantize:
        out = jnp.floor(out * 255.0) / 255.0
    return out
