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
    eot_iter stochastic forward passes (here: model assumed
    deterministic, gradients averaged over jittered inputs)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    adv = jnp.clip(images + jax.random.uniform(
        rng, images.shape, minval=-eps, maxval=eps), 0.0, 1.0)

    def body(i, adv):
        def one(j):
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
