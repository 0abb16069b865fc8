"""Projection of a *real photographed* adversarial object.

Reference: torchattacks/attacks/physical.py:20-94 — no optimization: a
separately supplied photographed adversarial texture is projected with
the benign object's mask (physical.py:63 builds the adv transform with
self.obj_mask), sample 0 ALWAYS pinned to (z0, alpha) = (6.1, 0)
(physical.py:80-81, not only in eval mode). Used by
evaluate_depth_physical.py:133-137 for real-world patch validation.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import PhysObjAttack, PhysObjAttackConfig


class PhysicalObjectAttack(PhysObjAttack):
    def __init__(self, predict_fn, obj_img, obj_mask, adv_obj_img,
                 cfg: PhysObjAttackConfig):
        cfg = dataclasses.replace(cfg, eval_pin_z0=6.1)
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        self.adv_obj_img = jnp.asarray(adv_obj_img)

    def _optimize(self, variables, scenes_full, rng):
        return self.adv_obj_img

    def __call__(self, variables, scenes, batch_size: int, rng,
                 eval_mode: bool = True):
        # the pin is unconditional in the reference (physical.py:80-81)
        return super().__call__(variables, scenes, batch_size, rng,
                                eval_mode=True)
