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
