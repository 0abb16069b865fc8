"""Auto-PGD (momentum + adaptive step halving) on the object texture.

Reference: torchattacks/attacks/phy_obj_atk_apgd.py:49-343 (Croce &
Hein's APGD adapted to the EoT depth objective). Key semantics kept:

  * the EoT projection uses a *fixed-seed* RandomState every evaluation
    (phy_obj_atk_apgd.py:104-110, 167-169, 238-240), so all steps see the
    SAME (z0, alpha) samples — replicated with one pinned PRNG key;
  * random start on the L-inf sphere scaled by max|t| (:140-142);
  * momentum iterate: a = 0.75 (1.0 on step 0),
    z = x_adv + a*(x_cand - x_adv) + (1-a)*(x_adv - x_adv_old), each
    stage clipped into the eps-box and [0,1] (:203-209);
  * checkpointed step-size control: at checkpoints (first after
    ceil(0.22*steps), interval shrinking by 0.03*steps to a floor of
    0.06*steps) halve the step and restart from the best iterate if the
    loss rose in fewer than rho*k of the last k steps or the best loss
    did not improve since the previous checkpoint (:253-289);
  * the texture has a leading dim of 1, so the per-sample bookkeeping
    degenerates to scalars; the returned texture is the final iterate
    (perturb(...)[1], :122 — not the best-loss one), matching the
    reference's forward().

The whole optimization is one lax.fori_loop; the loss history lives in a
fixed (steps,) buffer and the oscillation test is a masked reduction
over it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import PhysObjAttack, PhysObjAttackConfig


class APGDObjectAttack(PhysObjAttack):
    def __init__(self, predict_fn, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig, norm: str = "Linf",
                 eps: float = 8 / 255, steps: int = 100,
                 n_restarts: int = 1, seed: int = 17,
                 rho: float = 0.75):
        super().__init__(predict_fn, obj_img, obj_mask, cfg)
        if norm not in ("Linf", "L2"):
            raise ValueError(norm)
        self.norm = norm
        self.eps = eps
        self.steps = steps
        self.n_restarts = n_restarts
        self.seed = seed
        self.rho = rho
        self.steps_2 = max(int(0.22 * steps), 1)
        self.steps_min = max(int(0.06 * steps), 1)
        self.size_decr = max(int(0.03 * steps), 1)

    # fixed EoT samples for every loss/grad evaluation
    def _pinned_za(self, batch):
        key = jax.random.PRNGKey(self.seed)
        return self._sample_za(key, batch)

    def _loss_grad(self, variables, scenes_full, z0s, alphas, x_adv):
        def loss_fn(obj):
            # loss = -MSE(masked disp, 0): APGD *maximizes* it
            return -self._objective(variables, scenes_full, obj,
                                    z0s, alphas)

        return jax.value_and_grad(loss_fn)(x_adv)

    def _project(self, x0, z):
        if self.norm == "Linf":
            z = jnp.minimum(jnp.maximum(z, x0 - self.eps), x0 + self.eps)
            return jnp.clip(z, 0.0, 1.0)
        delta = z - x0
        n = jnp.sqrt(jnp.sum(delta ** 2)) + 1e-12
        delta = delta / n * jnp.minimum(self.eps, n)
        return jnp.clip(x0 + delta, 0.0, 1.0)

    def _single_run(self, variables, scenes_full, rng):
        B = scenes_full.shape[0]
        x0 = self.obj_img
        z0s, alphas = self._pinned_za(B)

        t = jax.random.uniform(rng, x0.shape, minval=-1.0, maxval=1.0)
        if self.norm == "Linf":
            x_adv = x0 + self.eps * t / jnp.max(jnp.abs(t))
        else:
            x_adv = x0 + self.eps * t / (
                jnp.sqrt(jnp.sum(t ** 2)) + 1e-12)
        x_adv = jnp.clip(x_adv, 0.0, 1.0)

        loss0, grad0 = self._loss_grad(variables, scenes_full, z0s,
                                       alphas, x_adv)

        state = dict(
            x_adv=x_adv, x_old=x_adv, grad=grad0,
            x_best=x_adv, grad_best=grad0, loss_best=loss0,
            loss_best_last_check=loss0,
            reduced_last_check=jnp.asarray(True),
            step_size=jnp.asarray(2.0 * self.eps),
            loss_steps=jnp.full((self.steps,), -jnp.inf),
            counter3=jnp.asarray(0, jnp.int32),
            k=jnp.asarray(self.steps_2, jnp.int32),
        )

        def body(i, st):
            a = jnp.where(i > 0, 0.75, 1.0)
            if self.norm == "Linf":
                cand = st["x_adv"] + st["step_size"] * \
                    jnp.sign(st["grad"])
            else:
                g = st["grad"]
                cand = st["x_adv"] + st["step_size"] * g / (
                    jnp.sqrt(jnp.sum(g ** 2)) + 1e-12)
            cand = self._project(x0, cand)
            z = st["x_adv"] + a * (cand - st["x_adv"]) + \
                (1.0 - a) * (st["x_adv"] - st["x_old"])
            x_new = self._project(x0, z)

            loss, grad = self._loss_grad(variables, scenes_full, z0s,
                                         alphas, x_new)

            better = loss > st["loss_best"]
            x_best = jnp.where(better, x_new, st["x_best"])
            grad_best = jnp.where(better, grad, st["grad_best"])
            loss_best = jnp.where(better, loss, st["loss_best"])
            loss_steps = st["loss_steps"].at[i].set(loss)

            counter3 = st["counter3"] + 1
            at_checkpoint = counter3 == st["k"]

            # oscillation test over the last k steps (:124-129)
            idx = jnp.arange(self.steps)
            prev = jnp.concatenate([jnp.full((1,), -jnp.inf),
                                    loss_steps[:-1]])
            rose = (loss_steps > prev).astype(jnp.float32)
            window = ((idx <= i) & (idx > i - st["k"])).astype(
                jnp.float32)
            n_rose = jnp.sum(rose * window)
            fl_osc = n_rose <= st["k"].astype(jnp.float32) * self.rho
            fl_no_impr = (~st["reduced_last_check"]) & \
                (st["loss_best_last_check"] >= loss_best)
            fl = fl_osc | fl_no_impr

            halve = at_checkpoint & fl
            step_size = jnp.where(halve, st["step_size"] / 2.0,
                                  st["step_size"])
            x_new = jnp.where(halve, x_best, x_new)
            grad = jnp.where(halve, grad_best, grad)

            k = jnp.where(at_checkpoint,
                          jnp.maximum(st["k"] - self.size_decr,
                                      self.steps_min), st["k"])
            counter3 = jnp.where(at_checkpoint, 0, counter3)
            loss_best_last_check = jnp.where(at_checkpoint, loss_best,
                                             st["loss_best_last_check"])
            reduced_last_check = jnp.where(at_checkpoint, fl,
                                           st["reduced_last_check"])

            return dict(
                x_adv=x_new, x_old=st["x_adv"], grad=grad,
                x_best=x_best, grad_best=grad_best, loss_best=loss_best,
                loss_best_last_check=loss_best_last_check,
                reduced_last_check=reduced_last_check,
                step_size=step_size, loss_steps=loss_steps,
                counter3=counter3, k=k)

        final = jax.lax.fori_loop(0, self.steps, body, state)
        return final["x_adv"]

    def _optimize(self, variables, scenes_full, rng):
        # n_restarts: the reference keeps the first restart's result for
        # its degenerate always-"fooled" accuracy logic (perturb
        # :315-327 flips acc to 0 after restart 0) — one run suffices.
        return self._single_run(variables, scenes_full, rng)
