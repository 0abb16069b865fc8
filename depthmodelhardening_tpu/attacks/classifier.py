"""Stock classifier attacks (vendored-torchattacks surface).

The reference vendors torchattacks v3.2.2 whose classifier attacks are
importable but unused by the depth pipeline (torchattacks/__init__.py:
1-36; only PGD_depth and the Phy_obj_atk* family are imported by
pipeline code — evaluate_depth.py:25-34). The gradient-based core of
that surface is provided here as jit-compiled functions over a generic
`logits_fn(variables, images) -> (B, n_classes)`.

Implemented: FGSM, BIM, RFGSM, PGD, PGDL2, EOTPGD, FFGSM, TPGD, MIFGSM,
GN, VANILA. The remaining vendored attacks (FAB, OnePixel's
differential-evolution port, SparseFool, ...) are research baselines the
pipeline never exercises; they are intentionally out of scope.

All attacks are targeted=False by default and accept `targeted=True`
with target labels, mirroring the torchattacks convention (attack.py:
60-108: targeted mode flips the loss sign).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _ce(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def _loss_grad(logits_fn, variables, images, labels, targeted):
    def loss(x):
        l = jnp.mean(_ce(logits_fn(variables, x), labels))
        return -l if targeted else l

    return jax.grad(loss)(images)


def fgsm(logits_fn, variables, images, labels, eps=8 / 255,
         targeted=False):
    """torchattacks/attacks/fgsm.py."""
    g = _loss_grad(logits_fn, variables, images, labels, targeted)
    return jnp.clip(images + eps * jnp.sign(g), 0.0, 1.0)


def bim(logits_fn, variables, images, labels, eps=8 / 255,
        alpha=2 / 255, steps=10, targeted=False):
    """torchattacks/attacks/bim.py: iterative FGSM with per-step clamp
    into the moving eps-box."""
    ori = images

    def body(_, adv):
        g = _loss_grad(logits_fn, variables, adv, labels, targeted)
        adv = adv + alpha * jnp.sign(g)
        a = jnp.maximum(jnp.maximum(ori - eps, 0.0), adv)
        return jnp.minimum(jnp.minimum(ori + eps, 1.0), a)

    return jax.lax.fori_loop(0, steps, body, images)


def rfgsm(logits_fn, variables, images, labels, eps=8 / 255,
          alpha=2 / 255, steps=10, rng=None, targeted=False):
    """torchattacks/attacks/rfgsm.py: random step then FGSM steps."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    adv = images + (eps - alpha) * jnp.sign(
        jax.random.normal(rng, images.shape))
    adv = jnp.clip(adv, 0.0, 1.0)

    def body(_, adv):
        g = _loss_grad(logits_fn, variables, adv, labels, targeted)
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, adv)


def pgd(logits_fn, variables, images, labels, eps=8 / 255,
        alpha=2 / 255, steps=10, random_start=True, rng=None,
        targeted=False):
    """torchattacks/attacks/pgd.py."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    adv = images
    if random_start:
        adv = jnp.clip(images + jax.random.uniform(
            rng, images.shape, minval=-eps, maxval=eps), 0.0, 1.0)

    def body(_, adv):
        g = _loss_grad(logits_fn, variables, adv, labels, targeted)
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, adv)


def pgdl2(logits_fn, variables, images, labels, eps=1.0, alpha=0.2,
          steps=10, random_start=True, rng=None, targeted=False,
          eps_div=1e-10):
    """torchattacks/attacks/pgdl2.py."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    B = images.shape[0]
    adv = images
    if random_start:
        kn, kr = jax.random.split(rng)
        d = jax.random.normal(kn, images.shape)
        n = jnp.sqrt(jnp.sum(d.reshape(B, -1) ** 2, 1)).reshape(
            B, 1, 1, 1)
        r = jax.random.uniform(kr, (B, 1, 1, 1))
        adv = jnp.clip(images + d * r / n * eps, 0.0, 1.0)

    def body(_, adv):
        g = _loss_grad(logits_fn, variables, adv, labels, targeted)
        gn = jnp.sqrt(jnp.sum(g.reshape(B, -1) ** 2, 1)).reshape(
            B, 1, 1, 1) + eps_div
        adv = adv + alpha * g / gn
        delta = adv - images
        dn = jnp.sqrt(jnp.sum(delta.reshape(B, -1) ** 2, 1))
        factor = jnp.minimum(eps / jnp.maximum(dn, eps_div), 1.0)
        return jnp.clip(
            images + delta * factor.reshape(B, 1, 1, 1), 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, adv)


def eotpgd(logits_fn, variables, images, labels, eps=8 / 255,
           alpha=2 / 255, steps=10, eot_iter=2, rng=None,
           targeted=False):
    """torchattacks/attacks/eotpgd.py: PGD with gradients averaged over
    eot_iter forward passes. Like the reference, the averaging only
    matters when the model itself is stochastic (randomized defenses) —
    pass a logits_fn that consumes a `rng` keyword to make the passes
    differ; a deterministic model reduces to plain PGD."""
    import inspect

    rng = jax.random.PRNGKey(0) if rng is None else rng
    stochastic = "rng" in inspect.signature(logits_fn).parameters
    adv = jnp.clip(images + jax.random.uniform(
        rng, images.shape, minval=-eps, maxval=eps), 0.0, 1.0)

    def body(i, adv):
        def one(j):
            if stochastic:
                key = jax.random.fold_in(rng, i * eot_iter + j + 1)

                def loss(x):
                    l = jnp.mean(_ce(
                        logits_fn(variables, x, rng=key), labels))
                    return -l if targeted else l

                return jax.grad(loss)(adv)
            return _loss_grad(logits_fn, variables, adv, labels,
                              targeted)

        g = jnp.mean(jnp.stack([one(j) for j in range(eot_iter)]), 0)
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, adv)


def ffgsm(logits_fn, variables, images, labels, eps=8 / 255,
          alpha=10 / 255, rng=None, targeted=False):
    """torchattacks/attacks/ffgsm.py: random start + single step."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    adv = jnp.clip(images + jax.random.uniform(
        rng, images.shape, minval=-eps, maxval=eps), 0.0, 1.0)
    g = _loss_grad(logits_fn, variables, adv, labels, targeted)
    adv = adv + alpha * jnp.sign(g)
    delta = jnp.clip(adv - images, -eps, eps)
    return jnp.clip(images + delta, 0.0, 1.0)


def tpgd(logits_fn, variables, images, rng=None, eps=8 / 255,
         alpha=2 / 255, steps=10):
    """torchattacks/attacks/tpgd.py: KL(adv || clean) PGD (TRADES)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    logit_ori = jax.lax.stop_gradient(logits_fn(variables, images))
    adv = images + 0.001 * jax.random.normal(rng, images.shape)

    def kl(x):
        logp = jax.nn.log_softmax(logits_fn(variables, x))
        p_ori = jax.nn.softmax(logit_ori)
        return jnp.sum(p_ori * (jax.nn.log_softmax(logit_ori) - logp)) \
            / x.shape[0]

    def body(_, adv):
        g = jax.grad(kl)(adv)
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, adv)


def mifgsm(logits_fn, variables, images, labels, eps=8 / 255,
           alpha=2 / 255, steps=10, decay=1.0, targeted=False):
    """torchattacks/attacks/mifgsm.py: momentum FGSM."""

    def body(_, carry):
        adv, momentum = carry
        g = _loss_grad(logits_fn, variables, adv, labels, targeted)
        g = g / jnp.mean(jnp.abs(g), axis=(1, 2, 3), keepdims=True)
        g = g + decay * momentum
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0), g

    adv, _ = jax.lax.fori_loop(0, steps, body,
                               (images, jnp.zeros_like(images)))
    return adv


def gn(images, rng=None, std=0.1):
    """torchattacks/attacks/gn.py: additive Gaussian noise."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    return jnp.clip(images + std * jax.random.normal(rng, images.shape),
                    0.0, 1.0)


def vanila(images):
    """torchattacks/attacks/vanila.py: identity."""
    return images


def cw(logits_fn, variables, images, labels, c=1.0, kappa=0.0,
       steps=50, lr=0.01, targeted=False):
    """torchattacks/attacks/cw.py: Carlini-Wagner L2 in tanh space with
    the f6 margin objective; Adam on the tanh-space variable."""
    import optax

    w0 = jnp.arctanh(jnp.clip(images * 2.0 - 1.0, -1 + 1e-6, 1 - 1e-6))

    def decode(w):
        return (jnp.tanh(w) + 1.0) / 2.0

    def f_margin(logits):
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        real = jnp.sum(one_hot * logits, axis=1)
        other = jnp.max(logits - one_hot * 1e4, axis=1)
        if targeted:
            return jnp.maximum(other - real, -kappa)
        return jnp.maximum(real - other, -kappa)

    def loss_fn(w):
        adv = decode(w)
        l2 = jnp.sum((adv - images) ** 2, axis=(1, 2, 3))
        return jnp.sum(l2 + c * f_margin(logits_fn(variables, adv)))

    tx = optax.adam(lr)
    opt_state = tx.init(w0)

    def body(_, carry):
        w, opt_state, best, best_l2 = carry
        g = jax.grad(loss_fn)(w)
        updates, opt_state = tx.update(g, opt_state, w)
        w = optax.apply_updates(w, updates)
        adv = decode(w)
        l2 = jnp.sum((adv - images) ** 2, axis=(1, 2, 3))
        logits = logits_fn(variables, adv)
        pred = jnp.argmax(logits, axis=1)
        succ = (pred == labels) if targeted else (pred != labels)
        better = succ & (l2 < best_l2)
        best = jnp.where(better[:, None, None, None], adv, best)
        best_l2 = jnp.where(better, l2, best_l2)
        return w, opt_state, best, best_l2

    init = (w0, opt_state, images, jnp.full((images.shape[0],), 1e10))
    _, _, best, _ = jax.lax.fori_loop(0, steps, body, init)
    return best


def deepfool(logits_fn, variables, images, labels, steps=50,
             overshoot=0.02):
    """torchattacks/attacks/deepfool.py: iterative minimal L2 push over
    the nearest decision boundary (batch-vectorized)."""

    def one(img, label):
        def cond(carry):
            i, x, done = carry
            return (i < steps) & (~done)

        def body(carry):
            i, x, _ = carry
            logits, jac = logits_fn(variables, x[None])[0], None
            jac = jax.jacobian(
                lambda a: logits_fn(variables, a[None])[0])(x)
            nc = logits.shape[-1]
            fk = logits - logits[label]
            wk = jac - jac[label]
            wk_flat = wk.reshape(nc, -1)
            norms = jnp.linalg.norm(wk_flat, axis=1) + 1e-8
            dist = jnp.abs(fk) / norms
            dist = dist.at[label].set(jnp.inf)
            l = jnp.argmin(dist)
            r = (jnp.abs(fk[l]) / (norms[l] ** 2)) * wk[l]
            x = jnp.clip(x + (1 + overshoot) * r, 0.0, 1.0)
            done = jnp.argmax(
                logits_fn(variables, x[None])[0]) != label
            return i + 1, x, done

        _, x, _ = jax.lax.while_loop(
            cond, body, (0, img, jnp.asarray(False)))
        return x

    return jax.vmap(one)(images, labels)


def difgsm(logits_fn, variables, images, labels, eps=8 / 255,
           alpha=2 / 255, steps=10, decay=0.0, resize_rate=0.9,
           diversity_prob=0.5, rng=None, targeted=False):
    """torchattacks/attacks/difgsm.py: MI-FGSM with random
    resize+pad input diversity at each step."""
    from ..ops.resize import bilinear_resize

    rng = jax.random.PRNGKey(0) if rng is None else rng
    B, H, W, C = images.shape
    low = int(H * resize_rate) if resize_rate < 1 else H

    def diversify(x, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # static resize target (the reference samples it; one draw per
        # attack keeps shapes static under jit)
        rnd = low
        small = bilinear_resize(x, rnd, int(W * resize_rate))
        ph = H - small.shape[1]
        pw = W - small.shape[2]
        top = jax.random.randint(k1, (), 0, ph + 1)
        left = jax.random.randint(k2, (), 0, pw + 1)
        padded = jnp.zeros_like(x)
        padded = jax.lax.dynamic_update_slice(
            padded, small, (0, top, left, 0))
        use = jax.random.uniform(k3, ()) < diversity_prob
        return jnp.where(use, padded, x)

    def body(i, carry):
        adv, momentum = carry
        key = jax.random.fold_in(rng, i)

        def loss(a):
            l = jnp.mean(_ce(logits_fn(variables, diversify(a, key)),
                             labels))
            return -l if targeted else l

        g = jax.grad(loss)(adv)
        g = g / (jnp.mean(jnp.abs(g), axis=(1, 2, 3),
                          keepdims=True) + 1e-12)
        g = g + decay * momentum
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0), g

    adv, _ = jax.lax.fori_loop(0, steps, body,
                               (images, jnp.zeros_like(images)))
    return adv


def jitter(logits_fn, variables, images, labels, eps=8 / 255,
           alpha=2 / 255, steps=10, scale=10.0, std=0.1, rng=None):
    """torchattacks/attacks/jitter.py: PGD on the Jitter loss (scaled
    softmax-normalized logits + noise, MSE to one-hot, L2-normalized by
    perturbation size)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    B = images.shape[0]
    adv = jnp.clip(images + jax.random.uniform(
        rng, images.shape, minval=-eps, maxval=eps), 0.0, 1.0)

    def body(i, adv):
        key = jax.random.fold_in(rng, 1000 + i)

        def loss(a):
            logits = logits_fn(variables, a)
            norm_z = jnp.linalg.norm(logits, axis=1, keepdims=True)
            hat_z = jax.nn.softmax(scale * logits / (norm_z + 1e-12))
            hat_z = hat_z + std * jax.random.normal(key, hat_z.shape)
            one_hot = jax.nn.one_hot(labels, logits.shape[-1])
            f = jnp.mean((hat_z - one_hot) ** 2, axis=1)
            delta = (a - images).reshape(B, -1)
            dn = jnp.linalg.norm(delta, axis=1)
            f = jnp.where(dn > 0, f / (dn + 1e-12), f)
            return jnp.mean(f)

        g = jax.grad(loss)(adv)
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, adv)


def upgd(logits_fn, variables, images, labels, eps=8 / 255,
         alpha=2 / 255, steps=10, decay=1.0, rng=None, targeted=False,
         random_start=False, loss_type="ce"):
    """torchattacks/attacks/upgd.py: "ultimate" PGD — momentum +
    optional margin loss."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    adv = images
    if random_start:
        adv = jnp.clip(images + jax.random.uniform(
            rng, images.shape, minval=-eps, maxval=eps), 0.0, 1.0)

    def margin_loss(logits):
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        real = jnp.sum(one_hot * logits, axis=1)
        other = jnp.max(logits - one_hot * 1e4, axis=1)
        return jnp.mean(other - real)

    def body(_, carry):
        adv, momentum = carry

        def loss(a):
            logits = logits_fn(variables, a)
            if loss_type == "margin":
                l = margin_loss(logits)
            else:
                l = jnp.mean(_ce(logits, labels))
            return -l if targeted else l

        g = jax.grad(loss)(adv)
        g = g / (jnp.mean(jnp.abs(g), axis=(1, 2, 3),
                          keepdims=True) + 1e-12)
        g = g + decay * momentum
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0), g

    adv, _ = jax.lax.fori_loop(0, steps, body,
                               (adv, jnp.zeros_like(images)))
    return adv
