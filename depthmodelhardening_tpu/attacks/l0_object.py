"""L0 physical object attack (dual positive/negative patterns + Adam).

Reference: torchattacks/attacks/phy_obj_atk_l0.py:16-174. Two pattern
tensors are optimized with Adam(lr=0.5, betas=(0.5, 0.9)) for up to
2*steps iterations:

  pattern = clamp(pos, 0, 1) - clamp(neg, 0, 1)
  obj_adv = clamp(obj + pattern, 0, 1)
  cost    = MSE(disp(adv_scene) * mask, 0)
            + mask_weight * (mean(max_c tanh(pos/10)/(2-1e-7)+0.5)
                             + mean(max_c tanh(neg/10)/(2-1e-7)+0.5))

with the L0 ratio (nonzero pixels of the 1/255-thresholded pattern over
its initial count) controlling mask_weight (zeroed once the ratio hits
l0_thresh) and an early break when ratio <= thresh after `steps`
iterations (phy_obj_atk_l0.py:92-111). The final texture thresholds the
patterns at 1/255 (:142-150). Eval pins sample 0 at (z0, alpha) =
(6.1, 0) (:161-163).

TPU-native: lax.while_loop carrying (step, patterns, Adam state) — the
data-dependent early break stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops.color import apply_color_jitter, sample_color_jitter
from .base import PhysObjAttack, PhysObjAttackConfig


class L0ObjectAttack(PhysObjAttack):
    def __init__(self, predict_fn, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig, adam_lr: float = 0.5,
                 steps: int = 10, mask_wt: float = 0.1,
                 l0_thresh: float = 1 / 10, color_jit: bool = False,
                 jitter_seed: int = 0):
        # eval pin at z0=6.1 (phy_obj_atk_l0.py:162)
        if cfg.eval_pin_z0 == 7.0:
            import dataclasses

            cfg = dataclasses.replace(cfg, eval_pin_z0=6.1)
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        self.adam_lr = adam_lr
        self.steps = steps
        self.mask_wt = mask_wt
        self.l0_thresh = l0_thresh
        self.l0_clip = 1.0 / 255.0
        self.color_jit = color_jit
        if color_jit:
            import numpy as np

            self.jitter = sample_color_jitter(
                np.random.RandomState(jitter_seed))
        else:
            self.jitter = None
        self.optimizer = optax.adam(adam_lr, b1=0.5, b2=0.9)

    # -- L0 bookkeeping --------------------------------------------------------
    def _patterns(self, pos_t, neg_t):
        pattern_pos = jnp.clip(pos_t, 0.0, 1.0)
        pattern_neg = -jnp.clip(neg_t, 0.0, 1.0)
        return pattern_pos, pattern_neg

    def _cal_l0(self, pos_t, neg_t):
        """Nonzero pixel count of the thresholded pattern
        (phy_obj_atk_l0.py:43-52)."""
        pattern_pos, pattern_neg = self._patterns(pos_t, neg_t)
        pattern_pos = jnp.where(pattern_pos < self.l0_clip, 0.0, pattern_pos)
        pattern_neg = jnp.where(pattern_neg > -self.l0_clip, 0.0, pattern_neg)
        pattern = pattern_pos + pattern_neg
        per_pixel = jnp.sum(jnp.abs(pattern), axis=-1)  # channel sum
        return jnp.sum((per_pixel != 0).astype(jnp.float32))

    def _mask_cost(self, pos_t, neg_t):
        mp = jnp.max(jnp.tanh(pos_t / 10.0) / (2 - 1e-7) + 0.5, axis=-1)
        mn = jnp.max(jnp.tanh(neg_t / 10.0) / (2 - 1e-7) + 0.5, axis=-1)
        return jnp.mean(mp) + jnp.mean(mn)

    # -- optimization ------------------------------------------------------------
    def _optimize(self, variables, scenes_full, rng):
        k_pos, k_neg, k_loop = jax.random.split(rng, 3)
        shape = self.obj_img.shape
        pos_t = jax.random.uniform(k_pos, shape)
        neg_t = jax.random.uniform(k_neg, shape)

        batch = scenes_full.shape[0]
        opt_state = self.optimizer.init((pos_t, neg_t))
        l0_init = self._cal_l0(pos_t, neg_t)

        def total_cost(params, z0s, alphas, mask_weight):
            pos_t, neg_t = params
            pattern_pos, pattern_neg = self._patterns(pos_t, neg_t)
            obj_adv = jnp.clip(
                self.obj_img + pattern_pos + pattern_neg, 0.0, 1.0)
            # the jitter is a full-frame transform (its contrast term
            # reads the global image mean) — _objective falls back to
            # the reference paste-then-crop path when it is set
            transform = (None if self.jitter is None else
                         (lambda s: apply_color_jitter(s, *self.jitter)))
            adv_cost = self._objective(variables, scenes_full, obj_adv,
                                       z0s, alphas, transform=transform)
            return adv_cost + mask_weight * self._mask_cost(pos_t, neg_t)

        grad_fn = jax.grad(total_cost)

        def ratio_of(carry):
            _, (pos_t, neg_t), _ = carry
            return self._cal_l0(pos_t, neg_t) / l0_init

        def cond(carry):
            step, _, _ = carry
            ratio = ratio_of(carry)
            early_break = (ratio <= self.l0_thresh) & (step >= self.steps)
            return (step < 2 * self.steps) & (~early_break)

        def body(carry):
            step, params, opt_state = carry
            ratio = ratio_of(carry)
            mask_weight = jnp.where(ratio <= self.l0_thresh, 0.0,
                                    self.mask_wt)
            z0s, alphas = self._sample_za(
                jax.random.fold_in(k_loop, step), batch)
            grads = grad_fn(params, z0s, alphas, mask_weight)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return step + 1, params, opt_state

        _, (pos_t, neg_t), _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), (pos_t, neg_t), opt_state))

        # final thresholding (phy_obj_atk_l0.py:142-150)
        pattern_pos, pattern_neg = self._patterns(pos_t, neg_t)
        pattern_pos = jnp.where(pattern_pos < self.l0_clip, 0.0, pattern_pos)
        pattern_neg = jnp.where(pattern_neg > -self.l0_clip, 0.0, pattern_neg)
        return jnp.clip(self.obj_img + pattern_pos + pattern_neg, 0.0, 1.0)


def default_l0_config(obj_h: int, obj_w: int,
                      dist_range=None) -> PhysObjAttackConfig:
    kwargs = {}
    if dist_range is not None:
        kwargs["dist_range"] = tuple(float(x) for x in dist_range)
    return PhysObjAttackConfig(obj_h=obj_h, obj_w=obj_w,
                               eval_pin_z0=6.1, **kwargs)
