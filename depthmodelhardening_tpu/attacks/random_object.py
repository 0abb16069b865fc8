"""Non-optimizing / search-based baseline object attacks.

  * VanilaObjectAttack — projects a *given* texture with no optimization
    (phy_obj_atk_vanila.py:40-96); used to re-evaluate a fixed patch
    across scenes (evaluate_depth.py:180-182).
  * ArbiObjectAttack — paints the fixed region rows 90:170 x cols 100:200
    with random noise or a flat random color (phy_obj_atk_arbi.py:75-84),
    final distances linspace(5,30) and seeded alphas
    (phy_obj_atk_arbi.py:91-92).
  * GaussianObjectAttack — progressively Gaussian-blurs the same region
    (sigma ramps to max(h,w)/2) keeping the texture with the best
    targeted cost (phy_obj_atk_guassian.py:80-120). The scipy
    gaussian_filter is re-expressed as static separable 1-D convolutions
    (one pair per step — sigmas are compile-time constants) so the whole
    search stays on-device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import PhysObjAttack, PhysObjAttackConfig

# blur/paint region in object pixel coords (phy_obj_atk_guassian.py:90-91)
REGION_ROWS = (90, 170)
REGION_COLS = (100, 200)


def _region_mask(obj_h: int, obj_w: int,
                 rows: Tuple[int, int] = REGION_ROWS,
                 cols: Tuple[int, int] = REGION_COLS) -> np.ndarray:
    m = np.zeros((1, obj_h, obj_w, 1), np.float32)
    m[:, rows[0]:rows[1], cols[0]:cols[1], :] = 1.0
    return m


class VanilaObjectAttack(PhysObjAttack):
    """No optimization; the adversarial texture is supplied per call.

    The benign composite still uses the attack's stored original texture
    (phy_obj_atk_vanila.py:55-56 keeps phy_trans_ben bound to the
    original obj_img while forward() swaps only the adversarial one).
    The supplied texture is a *traced* argument, so re-evaluating a new
    patch does not retrace.
    """

    def _run_given(self, variables, scenes, obj_img, rng,
                   batch_size: int, eval_mode: bool):
        scenes_full = self._replicate(scenes, batch_size)
        return self._final_outputs(scenes_full, obj_img, rng, eval_mode) \
            + (obj_img,)

    def __call__(self, variables, scenes, obj_img, batch_size: int, rng,
                 eval_mode: bool = False):
        import functools

        key = ("vanila", batch_size, eval_mode, scenes.shape)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(functools.partial(
                self._run_given, batch_size=batch_size,
                eval_mode=eval_mode))
        adv, ben, masks, obj = self._jitted[key](
            variables, scenes, jnp.asarray(obj_img), rng)
        return adv, ben, masks, obj

    def _optimize(self, variables, scenes_full, rng):
        return self.obj_img


class ArbiObjectAttack(PhysObjAttack):
    """Random/flat "arbitrary pattern" baseline."""

    def __init__(self, predict_fn, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig, seed: int = 17):
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        self.seed = seed
        self._region = jnp.asarray(_region_mask(cfg.obj_h, cfg.obj_w))

    def _optimize(self, variables, scenes_full, rng):
        ku, kp, kc = jax.random.split(rng, 3)
        noise = jax.random.uniform(kp, self.obj_img.shape)
        flat = jnp.broadcast_to(jax.random.uniform(kc, (1, 1, 1, 3)),
                                self.obj_img.shape)
        pattern = jnp.where(jax.random.uniform(ku, ()) > 0.5, noise, flat)
        return self._region * pattern + self.obj_img * (1 - self._region)

    def _final_za(self, rng, batch: int):
        # phy_obj_atk_arbi.py:91-92: linspace distances + fixed-seed alphas
        z0 = jnp.linspace(5.0, 30.0, batch)
        alphas = np.random.RandomState(self.seed).choice(
            np.arange(-30, 31, 2, dtype=np.float32), batch, replace=True)
        return z0, jnp.asarray(alphas)

    def _band_sweep_extra(self):
        # the finals geometry above leaves the cfg ranges (z0 up to
        # 30 m > EVAL_DIST_RANGE's 29): feed its extremes into the
        # static banded-warp proof (base.py:_band_sweep_extra)
        return (5.0, 30.0), tuple(float(a) for a in range(-30, 31, 2))


def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage _gaussian_kernel1d (normalized, radius =
    int(truncate*sigma + 0.5))."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return (phi / phi.sum()).astype(np.float32)


def _blur_hw(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur over H and W with scipy 'reflect'
    (= numpy 'symmetric') boundary. img: (1, H, W, C), sigma static."""
    if sigma <= 0:
        return img
    k = jnp.asarray(_gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2
    H, W = img.shape[1], img.shape[2]
    # clamp pad to the image size (scipy handles long kernels by
    # repeated reflection; the blur region here is far from saturating)
    rh, rw = min(r, H - 1), min(r, W - 1)

    def conv_axis(x, axis, rad):
        kernel = k if rad == r else k[r - rad:r + rad + 1] / \
            k[r - rad:r + rad + 1].sum()
        pad = [(0, 0)] * 4
        pad[axis] = (rad, rad)
        xp = jnp.pad(x, pad, mode="symmetric")
        C = x.shape[-1]
        kh, kw = (kernel.shape[0], 1) if axis == 1 else (1, kernel.shape[0])
        rhs = jnp.broadcast_to(kernel.reshape(1, 1, kh, kw),
                               (C, 1, kh, kw))
        out = jax.lax.conv_general_dilated(
            jnp.moveaxis(xp, -1, 1), rhs, window_strides=(1, 1),
            padding="VALID", feature_group_count=C,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jnp.moveaxis(out, 1, -1)

    img = conv_axis(img, 1, rh)
    img = conv_axis(img, 2, rw)
    return img


class GaussianObjectAttack(PhysObjAttack):
    """Increasing-blur search keeping the best targeted cost."""

    def __init__(self, predict_fn, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig, steps: int = 10):
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        self.steps = steps
        self._region = jnp.asarray(_region_mask(cfg.obj_h, cfg.obj_w))

    def _optimize(self, variables, scenes_full, rng):
        B = scenes_full.shape[0]
        max_sigma = max(self.cfg.obj_h, self.cfg.obj_w) // 2
        best_cost = jnp.asarray(1e10)
        best = self.obj_img
        cur = self.obj_img
        for step in range(self.steps):
            sigma = (step + 1) / self.steps * max_sigma
            pattern = jnp.clip(_blur_hw(self.obj_img, sigma), 0.0, 1.0)
            cur = self._region * pattern + cur * (1 - self._region)
            key = jax.random.fold_in(rng, step)
            z0s, alphas = self._sample_za(key, B)
            cost = self._objective(variables, scenes_full, cur,
                                   z0s, alphas)
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best = jnp.where(better, cur, best)
        return best
