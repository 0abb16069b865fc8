"""Whole-image L-inf PGD on depth (no physical object).

Reference: torchattacks/attacks/pgd_depth.py:7-80. Scenes are resized to
1024x320 first; targeted mode pushes the predicted disparity toward zero,
untargeted mode away from the clean prediction. Returns
(adv_images, ben_images) at model resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.resize import bilinear_resize
from .base import SCENE_H, SCENE_W


class PGDImageAttack:
    def __init__(self, predict_fn, eps: float = 0.3, alpha: float = 2 / 255,
                 steps: int = 40, random_start: bool = True,
                 targeted: bool = True,
                 scene_hw=(SCENE_H, SCENE_W)):
        self.predict_fn = predict_fn
        self.eps = eps
        self.alpha = alpha
        self.steps = steps
        self.random_start = random_start
        self.targeted = targeted
        self.scene_hw = scene_hw
        self._jitted = None

    def _run(self, variables, scenes, rng):
        images = bilinear_resize(scenes, *self.scene_hw)
        depth_gt = jax.lax.stop_gradient(self.predict_fn(variables, images))

        adv = images
        if self.random_start:
            noise = jax.random.uniform(rng, images.shape, minval=-self.eps,
                                       maxval=self.eps)
            adv = jnp.clip(images + noise, 0.0, 1.0)

        if self.targeted:
            # cost = -MSE(out, 0) ascended == descend mean(out^2)
            def cost(a):
                out = self.predict_fn(variables, a)
                return jnp.mean(out ** 2)

            sign = -1.0
        else:
            def cost(a):
                out = self.predict_fn(variables, a)
                return jnp.mean((out - depth_gt) ** 2)

            sign = 1.0

        grad_fn = jax.grad(cost)

        def body(_, adv):
            g = grad_fn(adv)
            adv = adv + sign * self.alpha * jnp.sign(g)
            delta = jnp.clip(adv - images, -self.eps, self.eps)
            return jnp.clip(images + delta, 0.0, 1.0)

        adv = jax.lax.fori_loop(0, self.steps, body, adv)
        return adv, images

    def __call__(self, variables, scenes, rng):
        if self._jitted is None:
            self._jitted = jax.jit(self._run)
        return self._jitted(variables, scenes, rng)
