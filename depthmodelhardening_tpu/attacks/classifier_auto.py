"""AutoAttack family of classifier attacks (vendored-torchattacks
surface): APGD, APGD-T, FAB, Square, MultiAttack, AutoAttack.

Reference behavior: torchattacks/attacks/{apgd.py, apgdt.py, fab.py,
square.py, autoattack.py, multiattack.py} (torchattacks v3.2.2, the
Croce & Hein AutoAttack suite). Same generic interface as
`classifier.py`: every attack takes `logits_fn(variables, images) ->
(B, n_classes)` plus NHWC images in [0, 1].

TPU-first notes:
  * APGD/APGD-T run the full optimization (momentum iterate, per-sample
    adaptive step halving at Croce-Hein checkpoints) as ONE
    lax.fori_loop — the loss history lives in a fixed (steps, B)
    buffer, the oscillation test is a masked reduction, so the whole
    attack is a single XLA computation with no host sync per step.
  * FAB's box-constrained hyperplane projections (the reference's
    projection_linf / projection_l2, fab.py:118-260) are replaced by a
    single generic bisection on the Lagrange multiplier of
    min ||d||_p  s.t.  w.(x+d)=b, 0<=x+d<=1 — the KKT solution is
    clip(x - t*u) with u=sign(w) (Linf) or u=w (L2) and w.clip(x - t*u)
    monotone in t, so 50 fixed bisection steps solve it exactly and
    stay jit-friendly (no sorting-based special cases).
  * Square picks its per-iteration square via iota masks instead of
    dynamic-size slices, keeping all shapes static.

Square implements both norms: Linf (vertical-stripe init + one
eps-signed square per query) and L2 (eta-patterned init on a 5x5 grid,
then per-query mass reallocation between two random windows,
square.py:325-439) — the dynamic square side is handled by a static
per-iteration size schedule with iota-masked windows and pre-built
padded eta patterns. The depth pipeline's Square attack is
`square_object.py`.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .classifier import _ce


# ---------------------------------------------------------------------------
# losses


def _dlr_loss(logits, labels):
    """Difference-of-logits-ratio loss (apgd.py:147-153)."""
    z_sorted = jnp.sort(logits, axis=1)[:, ::-1]
    one_hot = jax.nn.one_hot(labels, logits.shape[-1])
    z_y = jnp.sum(one_hot * logits, axis=1)
    pi1_is_y = jnp.argmax(logits, axis=1) == labels
    top = z_y - jnp.where(pi1_is_y, z_sorted[:, 1], z_sorted[:, 0])
    return -top / (z_sorted[:, 0] - z_sorted[:, 2] + 1e-12)


def _dlr_loss_targeted(logits, labels, targets):
    """Targeted DLR (apgdt.py:130-136)."""
    z_sorted = jnp.sort(logits, axis=1)[:, ::-1]
    nc = logits.shape[-1]
    z_y = jnp.sum(jax.nn.one_hot(labels, nc) * logits, axis=1)
    z_t = jnp.sum(jax.nn.one_hot(targets, nc) * logits, axis=1)
    return -(z_y - z_t) / (
        z_sorted[:, 0] - (z_sorted[:, 2] + z_sorted[:, 3]) / 2 + 1e-12)


def _target_classes(logits_clean, n_classes):
    """Per-sample target classes: the 2nd..n_classes-th most probable
    (apgdt.py:52-53, fab.py:97-107). Returns (order, n_targets) where
    order[:, -tc] is the tc-th most likely class."""
    order = jnp.argsort(logits_clean, axis=1)
    n_targets = min(n_classes - 1, logits_clean.shape[-1] - 1)
    return order, n_targets


# ---------------------------------------------------------------------------
# APGD core (shared by apgd / apgdt)


def _apgd_checkpoints(steps):
    """Croce-Hein checkpoint iterations (apgd.py:85, 192-211): counter3
    hits k = ceil(0.22*steps) at loop index i = k-1, then k shrinks by
    0.03*steps down to 0.06*steps between checkpoints. The oscillation
    window at each checkpoint is the current k."""
    n2 = max(int(0.22 * steps), 1)
    nmin = max(int(0.06 * steps), 1)
    decr = max(int(0.03 * steps), 1)
    ckpts, k, pos = [], n2, n2 - 1
    while pos < steps:
        ckpts.append((pos, k))
        k = max(k - decr, nmin)
        pos += k
    mask = np.zeros(steps, dtype=bool)
    win = np.zeros(steps, dtype=np.int32)
    for c, kc in ckpts:
        mask[c] = True
        win[c] = kc
    return jnp.asarray(mask), jnp.asarray(win)


def _project(norm, x, x_orig, eps):
    if norm == "Linf":
        return jnp.clip(
            jnp.clip(x, x_orig - eps, x_orig + eps), 0.0, 1.0)
    d = x - x_orig
    B = x.shape[0]
    n = jnp.sqrt(jnp.sum(d.reshape(B, -1) ** 2, 1)).reshape(
        B, 1, 1, 1)
    d = d * jnp.minimum(eps / (n + 1e-12), 1.0)
    return jnp.clip(x_orig + d, 0.0, 1.0)


def _apgd_single_run(logits_fn, variables, images, labels, loss_fn,
                     norm, eps, steps, rho, rng, eot_iter=1):
    """One APGD restart, batched. Returns (x_best, x_best_adv,
    found_adv, loss_best). eot_iter > 1 averages the gradient over
    repeated evaluations (apgd.py:155-170) — pass a logits_fn taking a
    `rng` keyword to make the passes differ on stochastic models."""
    import inspect

    B = images.shape[0]
    bshape = (B, 1, 1, 1)
    ck_mask, ck_win = _apgd_checkpoints(steps)
    try:
        stochastic = "rng" in inspect.signature(logits_fn).parameters
    except (TypeError, ValueError):
        stochastic = False

    def loss_and_grad(x, i):
        """i: loop step (fresh EOT noise every step, apgd.py:155-170)."""
        def total(a, key=None):
            lg = (logits_fn(variables, a, rng=key) if stochastic
                  else logits_fn(variables, a))
            return jnp.sum(loss_fn(lg))

        if not stochastic:
            # deterministic model: eot_iter identical grads collapse
            g = jax.grad(total)(x)
            return loss_fn(logits_fn(variables, x)), g
        step_key = jax.random.fold_in(rng, 7 + i)
        # scan (not unroll): eot_iter=20 x steps=100 would bloat the
        # traced program otherwise
        g, _ = jax.lax.scan(
            lambda acc, k: (acc + jax.grad(total)(x, k), None),
            jnp.zeros_like(x), jax.random.split(step_key, eot_iter))
        g = g / eot_iter
        lg = logits_fn(variables, x,
                       rng=jax.random.fold_in(step_key, eot_iter))
        return loss_fn(lg), g

    # random start (apgd.py:181-190)
    if norm == "Linf":
        t = 2.0 * jax.random.uniform(rng, images.shape) - 1.0
        tmax = jnp.max(jnp.abs(t.reshape(B, -1)), 1).reshape(bshape)
        x_adv = images + eps * t / (tmax + 1e-12)
    else:
        t = jax.random.normal(rng, images.shape)
        tn = jnp.sqrt(jnp.sum(t.reshape(B, -1) ** 2, 1)).reshape(bshape)
        x_adv = images + eps * t / (tn + 1e-12)
    x_adv = jnp.clip(x_adv, 0.0, 1.0)

    def predict(x, i):
        lg = (logits_fn(variables, x,
                        rng=jax.random.fold_in(rng, 100000 + i))
              if stochastic else logits_fn(variables, x))
        return jnp.argmax(lg, axis=1)

    loss_indiv, grad = loss_and_grad(x_adv, -1)
    preds = predict(x_adv, -1)
    found = preds != labels
    x_best = x_adv
    grad_best = grad
    x_best_adv = jnp.where(found.reshape(bshape), x_adv, images)
    loss_best = loss_indiv
    # initial step 2*eps for both norms, with the L2 step applied to the
    # normalized gradient (apgd.py:192, 215-228)
    step_size = jnp.full(bshape, 2.0 * eps)

    loss_steps = jnp.zeros((steps, B))
    # bookkeeping for condition 2
    loss_best_last_check = loss_best
    reduced_last_check = jnp.ones((B,), bool)

    def body(i, carry):
        (x_adv, x_adv_old, grad, loss_best, x_best, grad_best,
         x_best_adv, found, step_size, loss_steps,
         loss_best_last_check, reduced_last_check) = carry

        a = jnp.where(i == 0, 1.0, 0.75)
        if norm == "Linf":
            z = x_adv + step_size * jnp.sign(grad)
            z = _project("Linf", z, images, eps)
            x_new = x_adv + a * (z - x_adv) + (1 - a) * (
                x_adv - x_adv_old)
            x_new = _project("Linf", x_new, images, eps)
        else:
            gn = jnp.sqrt(jnp.sum(grad.reshape(B, -1) ** 2, 1)).reshape(
                bshape)
            z = x_adv + step_size * grad / (gn + 1e-12)
            z = _project("L2", z, images, eps)
            x_new = x_adv + a * (z - x_adv) + (1 - a) * (
                x_adv - x_adv_old)
            x_new = _project("L2", x_new, images, eps)

        x_adv_old = x_adv
        x_adv = x_new
        loss_indiv, grad = loss_and_grad(x_adv, i)
        preds = predict(x_adv, i)
        is_adv = preds != labels
        # the reference overwrites with the LATEST adversarial iterate
        # every step (apgd.py:200-205)
        x_best_adv = jnp.where(is_adv.reshape(bshape), x_adv,
                               x_best_adv)
        found = found | is_adv

        improved = loss_indiv > loss_best
        x_best = jnp.where(improved.reshape(bshape), x_adv, x_best)
        grad_best = jnp.where(improved.reshape(bshape), grad,
                              grad_best)
        loss_best = jnp.maximum(loss_best, loss_indiv)
        loss_steps = loss_steps.at[i].set(loss_indiv)

        # checkpointed step-size control (apgd.py:244-267)
        def at_checkpoint(args):
            (step_size, x_adv, grad, loss_best_last_check,
             reduced_last_check) = args
            k = ck_win[i]
            idx = jnp.arange(steps)
            # count steps j in (i-k, i] where loss rose over step j-1;
            # j=0 compares against the reference's zero-initialized
            # loss_steps[-1] (check_oscillation, apgd.py:65-70)
            in_win = (idx > i - k) & (idx <= i)
            prev = jnp.concatenate(
                [jnp.zeros((1, B)), loss_steps[:-1]], axis=0)
            rises = jnp.sum(
                jnp.where(in_win[:, None], loss_steps > prev, False),
                axis=0)
            # halve when rises <= rho*k (reference: t <= k*k3)
            cond1 = rises <= rho * k
            cond2 = (~reduced_last_check) & (
                loss_best_last_check >= loss_best)
            reduce = cond1 | cond2
            new_step = jnp.where(reduce.reshape(bshape),
                                 step_size / 2.0, step_size)
            new_x = jnp.where(reduce.reshape(bshape), x_best, x_adv)
            # restarting from x_best also restores its gradient
            # (apgd.py:269-271 grad = grad_best.clone())
            new_grad = jnp.where(reduce.reshape(bshape), grad_best,
                                 grad)
            return new_step, new_x, new_grad, loss_best, reduce

        (step_size, x_adv, grad, loss_best_last_check,
         reduced_last_check) = jax.lax.cond(
            ck_mask[i], at_checkpoint,
            lambda args: (args[0], args[1], args[2],
                          loss_best_last_check, reduced_last_check),
            (step_size, x_adv, grad, loss_best_last_check,
             reduced_last_check))

        return (x_adv, x_adv_old, grad, loss_best, x_best, grad_best,
                x_best_adv, found, step_size, loss_steps,
                loss_best_last_check, reduced_last_check)

    carry = (x_adv, x_adv, grad, loss_best, x_best, grad_best,
             x_best_adv, found, step_size, loss_steps,
             loss_best_last_check, reduced_last_check)
    carry = jax.lax.fori_loop(0, steps, body, carry)
    x_best = carry[4]
    x_best_adv = carry[6]
    found = carry[7]
    loss_best = carry[3]
    return x_best, x_best_adv, found, loss_best


def apgd(logits_fn, variables, images, labels, norm="Linf",
         eps=8 / 255, steps=100, n_restarts=1, seed=0, loss="ce",
         rho=0.75, eot_iter=1, rng=None):
    """torchattacks/attacks/apgd.py: Auto-PGD (Croce & Hein 2020) with
    the ce or dlr loss. Returns original images for samples no restart
    fooled (apgd.py:55-80 semantics)."""
    if norm not in ("Linf", "L2"):
        raise ValueError(norm)
    if loss == "ce":
        loss_fn = lambda lg: _ce(lg, labels)
    elif loss == "dlr":
        loss_fn = lambda lg: _dlr_loss(lg, labels)
    else:
        raise ValueError(loss)
    rng = jax.random.PRNGKey(seed) if rng is None else rng

    B = images.shape[0]
    adv = images
    fooled = jnp.zeros((B,), bool)
    for r in range(n_restarts):
        key = jax.random.fold_in(rng, r)
        _, x_best_adv, found, _ = _apgd_single_run(
            logits_fn, variables, images, labels, loss_fn, norm, eps,
            steps, rho, key, eot_iter=eot_iter)
        take = found & ~fooled
        adv = jnp.where(take.reshape(B, 1, 1, 1), x_best_adv, adv)
        fooled = fooled | found
    return adv


def apgdt(logits_fn, variables, images, labels, norm="Linf",
          eps=8 / 255, steps=100, n_restarts=1, seed=0, rho=0.75,
          n_classes=10, rng=None):
    """torchattacks/attacks/apgdt.py: targeted Auto-PGD — one APGD run
    with the targeted DLR loss per target class (2nd..n_classes-th most
    probable), keeping the first success per sample."""
    if norm not in ("Linf", "L2"):
        raise ValueError(norm)
    rng = jax.random.PRNGKey(seed) if rng is None else rng
    B = images.shape[0]
    logits_clean = logits_fn(variables, images)
    order, n_targets = _target_classes(logits_clean, n_classes)
    adv = images
    fooled = jnp.zeros((B,), bool)
    for tc in range(2, n_targets + 2):
        targets = order[:, -tc]
        loss_fn = lambda lg, t=targets: _dlr_loss_targeted(
            lg, labels, t)
        for r in range(n_restarts):
            key = jax.random.fold_in(rng, tc * 1000 + r)
            _, x_best_adv, found, _ = _apgd_single_run(
                logits_fn, variables, images, labels, loss_fn, norm,
                eps, steps, rho, key)
            take = found & ~fooled
            adv = jnp.where(take.reshape(B, 1, 1, 1), x_best_adv, adv)
            fooled = fooled | found
    return adv


# ---------------------------------------------------------------------------
# FAB


def _proj_box_hyperplane(x, w, b, norm, n_bisect=50):
    """min ||d||_p s.t. w.(x+d) = b, 0 <= x+d <= 1, for p in
    {Linf, L2}. KKT form d = clip(x - t*u, 0, 1) - x with u = sign(w)
    (Linf) or u = w (L2); w.clip(x - t*u) is monotone in t, solved by
    doubling + bisection (60 doublings from 1e-3 bracket t up to
    ~1e15, covering tiny-gradient L2 hyperplanes). Returns d (same
    shape as x); if b is not reachable inside the box, the fully
    saturated d is returned."""
    c = jnp.sum(w * x) - b  # current side
    s = jnp.sign(jnp.where(c == 0, 1.0, c))
    u = s * (jnp.sign(w) if norm == "Linf" else w)

    def h(t):
        return jnp.sum(w * jnp.clip(x - t * u, 0.0, 1.0)) - b

    # bracket: double t until h crosses 0 (or saturates)
    def dbl_body(_, t_hi):
        return jnp.where(h(t_hi) * c > 0, t_hi * 2.0, t_hi)

    t_hi = jax.lax.fori_loop(0, 60, dbl_body, jnp.asarray(1e-3))

    def bis_body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) / 2.0
        same_side = h(mid) * c > 0
        return jnp.where(same_side, mid, lo), jnp.where(
            same_side, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bis_body,
                               (jnp.asarray(0.0), t_hi))
    t = (lo + hi) / 2.0
    return jnp.clip(x - t * u, 0.0, 1.0) - x


def _lp_norm(d, norm):
    flat = d.reshape(-1)
    if norm == "Linf":
        return jnp.max(jnp.abs(flat))
    return jnp.sqrt(jnp.sum(flat ** 2))


def fab(logits_fn, variables, images, labels, norm="Linf", eps=None,
        steps=100, n_restarts=1, alpha_max=0.1, eta=1.05, beta=0.9,
        seed=0, targeted=False, n_classes=10, rng=None,
        _target_labels=None):
    """torchattacks/attacks/fab.py: Fast Adaptive Boundary attack
    (Croce & Hein 2020) — minimal-norm attack via iterated projection
    onto the linearized decision boundary, with biased backward steps.
    Default eps per norm matches fab.py:57 ({Linf: .3, L2: 1.}).
    targeted=True runs the targeted variant per target class (2nd..
    n_classes-th most probable, fab.py:97-107), always projecting onto
    that class's boundary and keeping the smallest perturbation."""
    if norm not in ("Linf", "L2"):
        raise ValueError(norm)
    if eps is None:
        eps = {"Linf": 0.3, "L2": 1.0}[norm]
    rng = jax.random.PRNGKey(seed) if rng is None else rng

    if targeted:
        logits_clean = logits_fn(variables, images)
        order, n_targets = _target_classes(logits_clean, n_classes)
        B = images.shape[0]
        best = images
        best_norm = jnp.full((B,), jnp.inf)
        for tc in range(2, n_targets + 2):
            adv = fab(logits_fn, variables, images, labels, norm=norm,
                      eps=eps, steps=steps, n_restarts=n_restarts,
                      alpha_max=alpha_max, eta=eta, beta=beta,
                      rng=jax.random.fold_in(rng, tc),
                      _target_labels=order[:, -tc])
            flipped = jnp.argmax(
                logits_fn(variables, adv), axis=1) != labels
            d = (adv - images).reshape(B, -1)
            nrm = (jnp.max(jnp.abs(d), 1) if norm == "Linf" else
                   jnp.sqrt(jnp.sum(d ** 2, 1)))
            better = flipped & (nrm < best_norm)
            best = jnp.where(better.reshape(B, 1, 1, 1), adv, best)
            best_norm = jnp.where(better, nrm, best_norm)
        return best

    def one(img, label, key, target=None):
        def jac_and_logits(x):
            logits = logits_fn(variables, x[None])[0]
            jac = jax.jacobian(
                lambda a: logits_fn(variables, a[None])[0])(x)
            return logits, jac

        def closest_boundary(x):
            logits, jac = jac_and_logits(x)
            fk = logits - logits[label]
            wk = jac - jac[label]
            if target is not None:
                # targeted: always project onto the target class's
                # boundary (fab.py attack_single_run_targeted)
                w = wk[target]
                b = jnp.sum(w * x) - fk[target]
                return w, b
            nc = logits.shape[0]
            qnorm = (jnp.sum(jnp.abs(wk.reshape(nc, -1)), 1)
                     if norm == "Linf" else
                     jnp.sqrt(jnp.sum(wk.reshape(nc, -1) ** 2, 1)))
            dist = jnp.abs(fk) / (qnorm + 1e-12)
            dist = dist.at[label].set(jnp.inf)
            l = jnp.argmin(dist)
            # hyperplane w.z = b through the linearization
            w = wk[l]
            b = jnp.sum(w * x) - fk[l]
            return w, b

        def is_adv(x):
            return jnp.argmax(logits_fn(variables, x[None])[0]) != label

        def restart_init(k, x_orig):
            # random point within eps of x_orig (fab.py:436-448)
            t = (jax.random.uniform(k, x_orig.shape) * 2.0 - 1.0
                 if norm == "Linf" else
                 jax.random.normal(k, x_orig.shape))
            tn = (jnp.max(jnp.abs(t)) if norm == "Linf" else
                  jnp.sqrt(jnp.sum(t ** 2)))
            return jnp.clip(
                x_orig + 0.5 * eps * t / (tn + 1e-12), 0.0, 1.0)

        def run(x0):
            def body(_, carry):
                x_i, best, best_norm = carry
                w, bb = closest_boundary(x_i)
                d_i = _proj_box_hyperplane(x_i, w, bb, norm)
                d_o = _proj_box_hyperplane(img, w, bb, norm)
                ni = _lp_norm(d_i, norm)
                no = _lp_norm(d_o, norm)
                alpha = jnp.clip(ni / (ni + no + 1e-12), 0.0,
                                 alpha_max)
                x_new = jnp.clip(
                    (1 - alpha) * (x_i + eta * d_i)
                    + alpha * (img + eta * d_o), 0.0, 1.0)
                adv = is_adv(x_new)
                nrm = _lp_norm(x_new - img, norm)
                better = adv & (nrm < best_norm)
                best = jnp.where(better, x_new, best)
                best_norm = jnp.where(better, nrm, best_norm)
                # biased backward step toward the original on success
                # (fab.py:500-507)
                x_i = jnp.where(adv,
                                beta * x_new + (1 - beta) * img, x_new)
                return x_i, best, best_norm

            return jax.lax.fori_loop(
                0, steps, body, (x0, img, jnp.asarray(jnp.inf)))

        best, best_norm = img, jnp.asarray(jnp.inf)
        for r in range(n_restarts):
            x0 = img if r == 0 else restart_init(
                jax.random.fold_in(key, r), img)
            _, b_r, n_r = run(x0)
            take = n_r < best_norm
            best = jnp.where(take, b_r, best)
            best_norm = jnp.minimum(best_norm, n_r)

        # final bisection refinement between best adv and original
        def refine(_, carry):
            best, lo = carry
            mid = (best + lo) / 2.0
            adv = is_adv(mid)
            return jnp.where(adv, mid, best), jnp.where(adv, lo, mid)

        found = jnp.isfinite(best_norm)
        best, _ = jax.lax.fori_loop(0, 3, refine, (best, img))
        # report only perturbations within eps (fab.py:86-93)
        ok = found & (_lp_norm(best - img, norm) <= eps)
        return jnp.where(ok, best, img)

    keys = jax.random.split(rng, images.shape[0])
    if _target_labels is not None:
        return jax.vmap(
            lambda im, lb, k, t: one(im, lb, k, target=t)
        )(images, labels, keys, _target_labels)
    return jax.vmap(one)(images, labels, keys)


# ---------------------------------------------------------------------------
# Square (Linf)


def _square_margin_loss(logits_fn, variables, x, y, loss,
                        targeted=False):
    """(margin, minimized-loss) pair (square.py:71-91)."""
    logits = logits_fn(variables, x)
    nc = logits.shape[-1]
    one_hot = jax.nn.one_hot(y, nc)
    y_corr = jnp.sum(one_hot * logits, axis=1)
    y_others = jnp.max(
        jnp.where(one_hot > 0, -jnp.inf, logits), axis=1)
    margin = (y_others - y_corr) if targeted else (y_corr - y_others)
    if loss == "ce":
        xent = _ce(logits, y)
        return margin, (xent if targeted else -xent)
    return margin, margin  # 'margin'


def _square_schedule(n_queries, p_init, n_features, c, max_side,
                     rescale=True):
    """Static per-iteration square sizes from the p schedule
    (square.py:160-186), clamped to the shorter image side - 1
    (square.py:215) so wide/narrow images keep true squares."""
    sizes = np.zeros(n_queries, dtype=np.int32)
    for it in range(n_queries):
        t = int(it / n_queries * 10000) if rescale else it
        p = p_init
        for bound, div in ((8000, 512), (6000, 256), (4000, 128),
                           (2000, 64), (1000, 32), (500, 16),
                           (200, 8), (50, 4), (10, 2)):
            if t > bound:
                p = p_init / div
                break
        s_it = max(int(round(np.sqrt(p * n_features / c))), 1)
        sizes[it] = min(s_it, max_side)
    return sizes


def square(logits_fn, variables, images, labels, norm="Linf",
           eps=8 / 255, n_queries=5000, p_init=0.8, loss="margin",
           resc_schedule=True, seed=0, rng=None, targeted=False):
    """torchattacks/attacks/square.py: black-box random-search attack.
    Linf: vertical-stripe init + one random eps-signed square per
    query; L2: eta-patterned init + mass reallocation (_square_l2).
    The query loop is one lax.fori_loop with iota-mask squares."""
    if norm not in ("Linf", "L2"):
        raise ValueError(norm)
    if loss not in ("margin", "ce"):
        raise ValueError(loss)
    rng = jax.random.PRNGKey(seed) if rng is None else rng
    if norm == "L2":
        return _square_l2(logits_fn, variables, images, labels, eps,
                          n_queries, p_init, loss, resc_schedule, rng,
                          targeted)
    B, H, W, C = images.shape
    n_features = C * H * W
    sizes = jnp.asarray(_square_schedule(
        n_queries, p_init, n_features, C, max(min(H, W) - 1, 1),
        resc_schedule))

    def rand_sign(key, shape):
        return jnp.sign(
            2.0 * jax.random.uniform(key, shape) - 1.0 + 1e-12)

    k_init, rng = jax.random.split(rng)
    # vertical stripes: one sign per (column, channel) (square.py:195)
    x_best = jnp.clip(
        images + eps * rand_sign(k_init, (B, 1, W, C)), 0.0, 1.0)
    margin_min, loss_min = _square_margin_loss(
        logits_fn, variables, x_best, labels, loss, targeted)

    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]

    def body(i, carry):
        x_best, margin_min, loss_min = carry
        key = jax.random.fold_in(rng, i)
        kh, kw, ks = jax.random.split(key, 3)
        s = sizes[i]
        vh = jax.random.randint(kh, (), 0, jnp.maximum(H - s, 0) + 1)
        vw = jax.random.randint(kw, (), 0, jnp.maximum(W - s, 0) + 1)
        mask = ((rows >= vh) & (rows < vh + s)
                & (cols >= vw) & (cols < vw + s))
        delta = 2.0 * eps * rand_sign(ks, (1, 1, 1, C))
        x_new = jnp.where(mask[None, :, :, None],
                          x_best + delta, x_best)
        x_new = jnp.clip(
            jnp.clip(x_new, images - eps, images + eps), 0.0, 1.0)
        margin, l = _square_margin_loss(
            logits_fn, variables, x_new, labels, loss, targeted)
        improved = (l < loss_min) | (margin <= 0.0)
        # only still-robust samples are updated (square.py:202-214)
        upd = improved & (margin_min > 0.0)
        x_best = jnp.where(upd[:, None, None, None], x_new, x_best)
        loss_min = jnp.where(upd, l, loss_min)
        margin_min = jnp.where(upd, margin, margin_min)
        return x_best, margin_min, loss_min

    x_best, _, _ = jax.lax.fori_loop(
        0, n_queries, body, (x_best, margin_min, loss_min))
    return x_best


def _eta_rectangles(x, y):
    """Concentric-increment rectangle pattern (square.py:130-146)."""
    delta = np.zeros((x, y), np.float32)
    x_c, y_c = x // 2 + 1, y // 2 + 1
    cx, cy = x_c - 1, y_c - 1
    for counter in range(max(x_c, y_c)):
        delta[max(cx, 0):min(cx + 2 * counter + 1, x),
              max(cy, 0):min(cy + 2 * counter + 1, y)] += \
            1.0 / (counter + 1) ** 2
        cx -= 1
        cy -= 1
    return delta / np.sqrt((delta ** 2).sum())


def _eta(s):
    """+/- rectangle pattern of side s (square.py:148-158), without the
    random transpose (applied at use time)."""
    delta = np.zeros((s, s), np.float32)
    delta[:s // 2] = _eta_rectangles(s // 2, s)
    delta[s // 2:] = -_eta_rectangles(s - s // 2, s)
    return delta / np.sqrt((delta ** 2).sum())


def _square_l2_sizes(n_queries, p_init, n_features, c, max_side,
                     rescale=True):
    """L2 side schedule: >=3 and odd (square.py:300-302), clamped."""
    base = _square_schedule(n_queries, p_init, n_features, c,
                            max_side, rescale)
    sizes = np.maximum(base, 3)
    sizes = np.where(sizes % 2 == 0, sizes + 1, sizes)
    sizes = np.minimum(sizes, max_side if max_side % 2 else
                       max_side - 1)
    return sizes.astype(np.int32)


def _square_l2(logits_fn, variables, images, labels, eps, n_queries,
               p_init, loss, resc_schedule, rng, targeted):
    """Square Attack L2 (square.py:325-439): eta-patterned init over a
    5x5 grid, then per query the perturbation mass of one random
    window is zeroed and reallocated into another with a fresh eta
    pattern, keeping ||delta||_2 = eps."""
    B, H, W, C = images.shape
    n_features = C * H * W
    bshape = (B, 1, 1, 1)
    sizes = _square_l2_sizes(n_queries, p_init, n_features, C,
                             max(min(H, W) - 1, 3), resc_schedule)
    uniq = sorted(set(int(v) for v in sizes))
    smax = uniq[-1]
    # padded eta patterns per distinct size, indexed per iteration
    etas = np.zeros((len(uniq), smax, smax), np.float32)
    for k, sv in enumerate(uniq):
        etas[k, :sv, :sv] = _eta(sv)
    eta_idx = np.array([uniq.index(int(v)) for v in sizes], np.int32)
    etas = jnp.asarray(etas)
    eta_idx = jnp.asarray(eta_idx)
    sizes = jnp.asarray(sizes)

    rows = jnp.arange(H)[:, None, None]
    cols = jnp.arange(W)[None, :, None]

    def l2norm(d):
        return jnp.sqrt(jnp.sum(d.reshape(B, -1) ** 2, 1)).reshape(
            bshape)

    def rand_sign(key, shape):
        return jnp.sign(
            2.0 * jax.random.uniform(key, shape) - 1.0 + 1e-12)

    # init: eta(s0) tiles on a 5x5 grid with random signs
    # (square.py:325-343)
    s0 = H // 5
    sp = (H - s0 * 5) // 2
    eta0 = jnp.asarray(_eta(max(s0, 1)))
    delta = jnp.zeros_like(images)
    k_init, rng = jax.random.split(rng)
    for gi in range(H // max(s0, 1)):
        for gj in range(W // max(s0, 1)):
            vh, vw = sp + gi * s0, sp + gj * s0
            if vh + s0 > H or vw + s0 > W:
                continue
            key = jax.random.fold_in(k_init, gi * 1000 + gj)
            kt, ks_ = jax.random.split(key)
            pat0 = jnp.where(jax.random.uniform(kt, ()) > 0.5, eta0,
                             eta0.T)
            patch = pat0[None, :, :, None] * rand_sign(ks_,
                                                       (B, 1, 1, C))
            delta = jax.lax.dynamic_update_slice(
                delta, delta[:, vh:vh + s0, vw:vw + s0] + patch,
                (0, vh, vw, 0))
    x_best = jnp.clip(
        images + delta / (l2norm(delta) + 1e-12) * eps, 0.0, 1.0)
    margin_min, loss_min = _square_margin_loss(
        logits_fn, variables, x_best, labels, loss, targeted)

    def window(vh, vw, sv):
        return ((rows >= vh) & (rows < vh + sv)
                & (cols >= vw) & (cols < vw + sv))  # (H, W, 1)

    def body(i, carry):
        x_best, margin_min, loss_min = carry
        key = jax.random.fold_in(rng, i)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        sv = sizes[i]
        delta_curr = x_best - images
        vh = jax.random.randint(k1, (), 0, H - sv + 1)
        vw = jax.random.randint(k2, (), 0, W - sv + 1)
        vh2 = jax.random.randint(k3, (), 0, H - sv + 1)
        vw2 = jax.random.randint(k4, (), 0, W - sv + 1)
        m1 = window(vh, vw, sv)[None]
        m2 = window(vh2, vw2, sv)[None]

        norms_w1 = jnp.sqrt(jnp.sum(
            (delta_curr * m1) ** 2, axis=(1, 2), keepdims=True))
        norms_image = l2norm(delta_curr)
        mask_image = jnp.maximum(m1, m2)
        norms_windows = l2norm(delta_curr * mask_image)

        # fresh eta pattern placed at window 1, random transpose +
        # per-channel signs (square.py:320-323)
        pat = etas[eta_idx[i]]
        pat = jnp.where(jax.random.uniform(k5, ()) > 0.5, pat, pat.T)
        pat_full = jax.lax.dynamic_update_slice(
            jnp.zeros((H + smax, W + smax), pat.dtype), pat,
            (vh, vw))[:H, :W]
        signs = rand_sign(jax.random.fold_in(k5, 1), (B, 1, 1, C))
        new_deltas = pat_full[None, :, :, None] * signs
        new_deltas = new_deltas + delta_curr * m1 / (norms_w1 + 1e-12)
        nd_norm = jnp.sqrt(jnp.sum(
            (new_deltas * m1) ** 2, axis=(1, 2), keepdims=True))
        budget = jnp.sqrt(
            jnp.maximum(eps ** 2 - norms_image ** 2, 0.0) / C
            + norms_windows ** 2)
        new_deltas = new_deltas / (nd_norm + 1e-12) * budget

        delta_new = jnp.where(m2, 0.0, delta_curr)
        delta_new = jnp.where(m1, new_deltas, delta_new)

        x_new = jnp.clip(
            images + delta_new / (l2norm(delta_new) + 1e-12) * eps,
            0.0, 1.0)
        margin, l = _square_margin_loss(
            logits_fn, variables, x_new, labels, loss, targeted)
        improved = (l < loss_min) | (margin <= 0.0)
        upd = improved & (margin_min > 0.0)
        x_best = jnp.where(upd.reshape(bshape), x_new, x_best)
        loss_min = jnp.where(upd, l, loss_min)
        margin_min = jnp.where(upd, margin, margin_min)
        return x_best, margin_min, loss_min

    x_best, _, _ = jax.lax.fori_loop(
        0, n_queries, body, (x_best, margin_min, loss_min))
    return x_best


# ---------------------------------------------------------------------------
# ensembles


def multiattack(attacks: Sequence[Callable], logits_fn, variables,
                images, labels, rng=None):
    """torchattacks/attacks/multiattack.py: run attacks sequentially,
    keeping the first successful adversarial per sample. Each entry is
    a closure `fn(images, labels) -> adv`. Stochastic models (logits_fn
    with an `rng` keyword) are scored with a fresh key per attack."""
    import inspect

    try:
        stochastic = "rng" in inspect.signature(logits_fn).parameters
    except (TypeError, ValueError):
        stochastic = False
    rng = jax.random.PRNGKey(0) if rng is None else rng
    B = images.shape[0]
    adv = images
    fooled = jnp.zeros((B,), bool)
    for k, fn in enumerate(attacks):
        cand = fn(images, labels)
        lg = (logits_fn(variables, cand, rng=jax.random.fold_in(rng, k))
              if stochastic else logits_fn(variables, cand))
        is_adv = jnp.argmax(lg, axis=1) != labels
        take = is_adv & ~fooled
        adv = jnp.where(take.reshape(B, 1, 1, 1), cand, adv)
        fooled = fooled | is_adv
        if bool(jnp.all(fooled)):
            break
    return adv


def autoattack(logits_fn, variables, images, labels, norm="Linf",
               eps=8 / 255, n_classes=10, seed=0, version="standard",
               square_queries=5000):
    """torchattacks/attacks/autoattack.py: MultiAttack ensembles.
    standard: APGD-CE, APGD-T, FAB, Square (autoattack.py:48-54);
    plus: 5-restart APGD-CE/APGD-DLR/FAB + Square + APGD-T + targeted
    FAB (autoattack.py:56-64); rand: APGD-CE/APGD-DLR with eot_iter=20
    for randomized defenses (autoattack.py:66-70)."""
    if norm not in ("Linf", "L2"):
        raise ValueError(norm)

    def _apgd(loss, nr=1, eot=1):
        return lambda x, y: apgd(
            logits_fn, variables, x, y, norm=norm, eps=eps, seed=seed,
            loss=loss, n_restarts=nr, eot_iter=eot)

    def _apgdt():
        return lambda x, y: apgdt(
            logits_fn, variables, x, y, norm=norm, eps=eps, seed=seed,
            n_classes=n_classes, n_restarts=1)

    def _fab(nr=1, targeted=False):
        return lambda x, y: fab(
            logits_fn, variables, x, y, norm=norm, eps=eps, seed=seed,
            n_restarts=nr, targeted=targeted, n_classes=n_classes)

    def _square():
        return lambda x, y: square(
            logits_fn, variables, x, y, norm=norm, eps=eps, seed=seed,
            n_queries=square_queries)

    if version == "standard":
        fns = [_apgd("ce"), _apgdt(), _fab(), _square()]
    elif version == "plus":
        fns = [_apgd("ce", nr=5), _apgd("dlr", nr=5), _fab(nr=5),
               _square(), _apgdt(), _fab(targeted=True)]
    elif version == "rand":
        fns = [_apgd("ce", eot=20), _apgd("dlr", eot=20)]
    else:
        raise ValueError(
            "Not valid version. ['standard', 'plus', 'rand']")
    return multiattack(fns, logits_fn, variables, images, labels)
