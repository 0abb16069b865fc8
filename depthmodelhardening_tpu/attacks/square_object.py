"""Black-box Square Attack on the object texture (L-inf).

Reference: torchattacks/attacks/phy_obj_atk_square.py:55-511 (Andriushchenko
et al.'s Square Attack adapted to the EoT depth objective):

  * init: vertical-stripe perturbation x + eps*rademacher(c,1,w) (:258-260);
  * per query: square side s from the canonical p-schedule
    (p_init/2^k over iteration milestones rescaled to n_queries,
    :222-250), a uniformly placed s x s square gets a fresh +-2eps
    per-channel offset; candidate projected into the eps-box and [0,1]
    (:275-290); keep it when the targeted loss improves;
  * every loss evaluation projects with a fixed-seed sampler
    (depth_loss :123-133, rs=RandomState(seed)) -> pinned (z0, alpha),
    replicated here with one pinned PRNG key;
  * the "margin" channel is degenerate (depth_loss returns ones, so no
    early success exit) — the loop always runs n_queries.

Fidelity note: the reference evaluates `self.depth_loss(x_best, ...)`
instead of the candidate `x_new` (:291 — a transcription slip from the
classifier original), so its search can never accept an improvement and
it effectively returns the stripe init after n_queries wasted queries.
We implement the intended algorithm (evaluate x_new). The reference's L2
branch references an undefined variable (`y`, :349) and is unreachable;
only Linf is supported here, matching what actually runs upstream.

TPU design: squares are applied via coordinate masks (no dynamic-shape
slicing), so side s and position are traced values and the whole search
is one lax.fori_loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import PhysObjAttack, PhysObjAttackConfig

# (iteration-milestone, divisor) pairs of the canonical schedule
_P_MILESTONES = np.asarray([10, 50, 200, 500, 1000, 2000, 4000, 6000,
                            8000, 10001], np.float32)


class SquareObjectAttack(PhysObjAttack):
    def __init__(self, predict_fn, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig, eps: float = 0.1,
                 n_queries: int = 5000, p_init: float = 0.8,
                 seed: int = 17, resc_schedule: bool = True):
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        self.eps = eps
        self.n_queries = n_queries
        self.p_init = p_init
        self.seed = seed
        self.resc_schedule = resc_schedule

    def _p_selection(self, it):
        """p schedule (phy_obj_atk_square.py:222-250), branchless."""
        if self.resc_schedule:
            it = it / self.n_queries * 10000.0
        k = jnp.sum(it >= jnp.asarray(_P_MILESTONES[:-1]))
        return self.p_init / (2.0 ** k.astype(jnp.float32))

    def _pinned_za(self, batch):
        return self._sample_za(jax.random.PRNGKey(self.seed), batch)

    def _loss(self, variables, scenes_full, z0s, alphas, obj):
        return self._objective(variables, scenes_full, obj, z0s,
                               alphas)

    def _optimize(self, variables, scenes_full, rng):
        B = scenes_full.shape[0]
        h, w = self.cfg.obj_h, self.cfg.obj_w
        c = self.obj_img.shape[-1]
        n_features = c * h * w
        x0 = self.obj_img
        z0s, alphas = self._pinned_za(B)

        k_init, k_loop = jax.random.split(rng)
        stripes = jax.random.rademacher(
            k_init, (1, 1, w, c), jnp.float32)
        x_best = jnp.clip(x0 + self.eps * stripes, 0.0, 1.0)
        loss_min = self._loss(variables, scenes_full, z0s, alphas, x_best)

        rows = jnp.arange(h, dtype=jnp.float32)[:, None]
        cols = jnp.arange(w, dtype=jnp.float32)[None, :]

        def body(i, carry):
            x_best, loss_min = carry
            key = jax.random.fold_in(k_loop, i)
            kh, kw, ks = jax.random.split(key, 3)

            p = self._p_selection(i.astype(jnp.float32))
            s = jnp.clip(jnp.round(jnp.sqrt(p * n_features / c)),
                         1.0, min(h, w) - 1.0)
            # uniform integer in [0, dim - s) with traced s
            vh = jnp.floor(jax.random.uniform(kh, ()) *
                           jnp.maximum(h - s, 1.0))
            vw = jnp.floor(jax.random.uniform(kw, ()) *
                           jnp.maximum(w - s, 1.0))

            square = ((rows >= vh) & (rows < vh + s) &
                      (cols >= vw) & (cols < vw + s))
            offs = 2.0 * self.eps * jax.random.rademacher(
                ks, (1, 1, 1, c), jnp.float32)
            x_new = x_best + square[None, :, :, None] * offs
            x_new = jnp.clip(
                jnp.minimum(jnp.maximum(x_new, x0 - self.eps),
                            x0 + self.eps), 0.0, 1.0)

            loss = self._loss(variables, scenes_full, z0s, alphas, x_new)
            better = loss < loss_min
            return (jnp.where(better, x_new, x_best),
                    jnp.where(better, loss, loss_min))

        x_best, _ = jax.lax.fori_loop(0, self.n_queries, body,
                                      (x_best, loss_min))
        return x_best
