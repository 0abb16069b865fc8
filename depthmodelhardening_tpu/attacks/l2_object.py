"""L2-ball PGD on the physical object texture.

Reference: torchattacks/attacks/phy_obj_atk_l2.py:37-142 —
alpha = 2.5*eps/steps, random start uniformly inside the L2 eps-ball,
per-step EoT reprojection with fresh (z0, alpha), gradient normalized to
unit L2 norm, delta renormalized onto the eps-ball, clip to [0,1].

Note on fidelity: the reference normalizes the gradient with
`grad.view(batch_size, -1)` chunked norms even though the texture has a
leading dim of 1 (phy_obj_atk_l2.py:110-111); broadcasting then silently
expands the texture to one copy per batch sample from step 2 onward, so
the reference effectively optimizes per-sample textures with a
chunk-normalized first step. We implement the principled version of the
same behavior: per-sample textures from the start with true per-sample
gradient normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import PhysObjAttack, PhysObjAttackConfig


class L2ObjectAttack(PhysObjAttack):
    def __init__(self, predict_fn, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig, eps: float = 1.0,
                 steps: int = 40, random_start: bool = True,
                 eps_for_division: float = 1e-10):
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        self.eps = eps
        self.alpha = 2.5 * eps / steps  # phy_obj_atk_l2.py:44
        self.steps = steps
        self.random_start = random_start
        self.eps_div = eps_for_division

    def _optimize(self, variables, scenes_full, rng):
        B = scenes_full.shape[0]
        obj0 = jnp.broadcast_to(self.obj_img,
                                (B,) + self.obj_img.shape[1:])
        k_init, k_loop = jax.random.split(rng)

        adv = obj0
        if self.random_start:
            # uniform point inside the L2 ball (phy_obj_atk_l2.py:83-90)
            kn, kr = jax.random.split(k_init)
            delta = jax.random.normal(kn, adv.shape)
            n = jnp.sqrt(jnp.sum(delta.reshape(B, -1) ** 2, axis=1))
            r = jax.random.uniform(kr, (B,))
            delta = delta * (r / n).reshape(B, 1, 1, 1) * self.eps
            adv = jnp.clip(adv + delta, 0.0, 1.0)

        def cost_fn(adv_obj, key):
            z0s, alphas = self._sample_za(key, B)
            # targeted: ascend -MSE == descend MSE toward zero disparity
            return self._objective(variables, scenes_full, adv_obj,
                                   z0s, alphas)

        grad_fn = jax.grad(cost_fn)

        def body(i, adv):
            key = jax.random.fold_in(k_loop, i)
            g = -grad_fn(adv, key)  # ascend cost = -MSE
            gn = jnp.sqrt(jnp.sum(g.reshape(B, -1) ** 2, axis=1)) \
                + self.eps_div
            g = g / gn.reshape(B, 1, 1, 1)
            adv = adv + self.alpha * g
            delta = adv - obj0
            dn = jnp.sqrt(jnp.sum(delta.reshape(B, -1) ** 2, axis=1))
            factor = jnp.minimum(self.eps / jnp.maximum(dn, self.eps_div),
                                 1.0)
            delta = delta * factor.reshape(B, 1, 1, 1)
            return jnp.clip(obj0 + delta, 0.0, 1.0)

        return jax.lax.fori_loop(0, self.steps, body, adv)
