"""Black-box random-search light attack on the object.

Reference: torchattacks/attacks/phy_obj_atk_light.py:63-167 — sample
n_inits random light parameter vectors [wavelength, angle_deg, b, beta];
for each, n_neighbors times pick one of 10 coordinate patterns Q, a step
size in [1, 20), and evaluate init +/- step*q (the reference never
commits the move — all ~n_inits*n_neighbors*2 candidates compete for the
global best by targeted cost with fresh EoT samples each evaluation).

TPU design: candidate parameters are pre-sampled host-side (matching the
reference's numpy RNG structure), stacked, and the whole evaluation runs
as one lax.fori_loop carrying (best_cost, best_params); the winning
texture is regenerated once at the end. Each candidate builds its tube
light on-device from traced params (physics/light.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.light import simple_add, tube_light_by_func
from .base import PhysObjAttack, PhysObjAttackConfig

# coordinate search patterns (phy_obj_atk_light.py:90-100)
_Q = np.asarray([
    [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
    [1, 1, 0, 0], [1, 0, 1, 0], [1, 0, 0, 1], [0, 1, 1, 0],
    [0, 1, 0, 1], [0, 0, 1, 1]], np.float32)

_LO = np.asarray([380, 0, 0, 10], np.float32)
_HI = np.asarray([750, 180, 400, 1600], np.float32)


class LightObjectAttack(PhysObjAttack):
    def __init__(self, predict_fn, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig, n_inits: int = 200,
                 n_neighbors: int = 20, seed: int = 0):
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        self.n_inits = n_inits
        self.n_neighbors = n_neighbors
        self.seed = seed

    def _candidates(self) -> np.ndarray:
        """All candidate parameter vectors, (N, 4) float32."""
        rs = np.random.RandomState(self.seed)
        cands = []
        inits = [np.asarray([rs.randint(380, 750), rs.randint(0, 180),
                             rs.randint(0, 400), rs.randint(10, 1600)],
                            np.float32) for _ in range(self.n_inits)]
        for init_v in inits:
            for _ in range(self.n_neighbors):
                q = _Q[rs.randint(len(_Q))] * rs.randint(1, 20)
                for a in (-1.0, 1.0):
                    cands.append(np.clip(init_v + a * q, _LO, _HI))
        return np.stack(cands)

    def _apply_light(self, params):
        """Texture with the tube light described by params applied."""
        wavelength, angle, b, beta = (params[0], params[1], params[2],
                                      params[3])
        k = jnp.round(jnp.tan(jnp.deg2rad(angle)) * 100.0) / 100.0
        light = tube_light_by_func(k, b, 1.0, beta, wavelength,
                                   w=self.cfg.obj_w, h=self.cfg.obj_h)
        return simple_add(self.obj_img, light, 1.0)

    def _optimize(self, variables, scenes_full, rng):
        B = scenes_full.shape[0]
        cands = jnp.asarray(self._candidates())

        def body(i, carry):
            best_cost, best_params = carry
            params = cands[i]
            obj_adv = self._apply_light(params)
            key = jax.random.fold_in(rng, i)
            z0s, alphas = self._sample_za(key, B)
            cost = self._objective(variables, scenes_full, obj_adv,
                                   z0s, alphas)
            better = cost < best_cost
            return (jnp.where(better, cost, best_cost),
                    jnp.where(better, params, best_params))

        init = (jnp.asarray(1e10), cands[0])
        _, best_params = jax.lax.fori_loop(0, cands.shape[0], body, init)
        return self._apply_light(best_params)
