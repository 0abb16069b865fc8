"""Color jitter ops matching torchvision tensor-mode semantics.

Used by the L0 attack (fixed jitter sampled at construction,
torchattacks/attacks/phy_obj_atk_l0.py:41, 121-124) and the dataset
augmentation path (mono_dataset.py:88-98, 344-348). All jnp, NHWC,
differentiable, in [0, 1].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_GRAY_W = (0.2989, 0.587, 0.114)  # torchvision rgb_to_grayscale weights


def _blend(img1, img2, ratio):
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def rgb_to_grayscale(img):
    w = jnp.asarray(_GRAY_W, img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    mean = jnp.mean(rgb_to_grayscale(img), axis=(1, 2, 3), keepdims=True)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    return _blend(img, rgb_to_grayscale(img), factor)


def adjust_hue(img, factor):
    """Shift hue by factor (in turns, [-0.5, 0.5]) via HSV roundtrip,
    matching torchvision's tensor implementation."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(maxc > 0, maxc, ones)
    cr_div = jnp.where(cr > 0, cr, ones)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(cr == 0, jnp.zeros_like(h), h)

    h = (h + factor) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    i = i.astype(jnp.int32) % 6

    def sel(a0, a1, a2, a3, a4, a5):
        stacked = jnp.stack([a0, a1, a2, a3, a4, a5], axis=-1)
        return jnp.take_along_axis(stacked, i[..., None], axis=-1)[..., 0]

    r2 = sel(v, q, p, p, t, v)
    g2 = sel(t, v, v, q, p, p)
    b2 = sel(p, p, t, v, v, q)
    return jnp.stack([r2, g2, b2], axis=-1)


_JITTER_FNS = (adjust_brightness, adjust_contrast, adjust_saturation,
               adjust_hue)


def sample_color_jitter(rng: np.random.RandomState,
                        brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                        saturation=(0.8, 1.2), hue=(-0.1, 0.1)):
    """torchvision ColorJitter.get_params analogue: returns (order, factors)
    sampled once (host-side), to be applied as a fixed transform."""
    order = tuple(rng.permutation(4).tolist())
    factors = (
        float(rng.uniform(*brightness)),
        float(rng.uniform(*contrast)),
        float(rng.uniform(*saturation)),
        float(rng.uniform(*hue)),
    )
    return order, factors


def apply_color_jitter(img, order: Sequence[int],
                       factors: Tuple[float, float, float, float]):
    for idx in order:
        img = _JITTER_FNS[idx](img, factors[idx])
    return img
