"""Stock classifier attacks (vendored-torchattacks surface).

The reference vendors torchattacks v3.2.2 whose classifier attacks are
importable but unused by the depth pipeline (torchattacks/__init__.py:
1-36; only PGD_depth and the Phy_obj_atk* family are imported by
pipeline code — evaluate_depth.py:25-34). The gradient-based core of
that surface is provided here as jit-compiled functions over a generic
`logits_fn(variables, images) -> (B, n_classes)`.

Implemented here: FGSM, BIM, RFGSM, PGD, PGDL2, EOTPGD, FFGSM, TPGD,
MIFGSM, GN, VANILA, CW, DeepFool, DIFGSM, Jitter, UPGD, TIFGSM,
SparseFool, OnePixel (with a compact differential-evolution core in
place of the reference's vendored SciPy port,
torchattacks/attacks/_differential_evolution.py). The AutoAttack family
(APGD, APGDT, FAB, Square, AutoAttack, MultiAttack) lives in
`classifier_auto.py`.

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


def _deepfool_single(logits_fn, variables, img, label, steps,
                     overshoot):
    """One-sample DeepFool; returns (adv, boundary_label)."""

    def cond(carry):
        i, x, done, _ = carry
        return (i < steps) & (~done)

    def body(carry):
        i, x, _, _ = carry
        logits = logits_fn(variables, x[None])[0]
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
        done = jnp.argmax(logits_fn(variables, x[None])[0]) != label
        return i + 1, x, done, l

    _, x, _, tl = jax.lax.while_loop(
        cond, body, (0, img, jnp.asarray(False),
                     jnp.asarray(0, jnp.int32)))
    return x, tl


def deepfool(logits_fn, variables, images, labels, steps=50,
             overshoot=0.02, return_target_labels=False):
    """torchattacks/attacks/deepfool.py: iterative minimal L2 push over
    the nearest decision boundary (batch-vectorized).
    `return_target_labels` mirrors the reference flag (deepfool.py:44)
    used by SparseFool: also return the boundary class of each sample."""
    adv, tl = jax.vmap(
        lambda im, lb: _deepfool_single(
            logits_fn, variables, im, lb, steps, overshoot)
    )(images, labels)
    if return_target_labels:
        return adv, tl
    return adv


def _input_diversity(x, key, low_h, low_w, diversity_prob):
    """DI-FGSM random resize+pad input diversity, shared by difgsm and
    tifgsm (difgsm.py:28-46). The resize target is one static draw per
    attack (the reference samples it per step; static keeps shapes
    jit-stable)."""
    from ..ops.resize import bilinear_resize

    B, H, W, C = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    small = bilinear_resize(x, low_h, low_w)
    top = jax.random.randint(k1, (), 0, H - low_h + 1)
    left = jax.random.randint(k2, (), 0, W - low_w + 1)
    padded = jax.lax.dynamic_update_slice(
        jnp.zeros_like(x), small, (0, top, left, 0))
    use = jax.random.uniform(k3, ()) < diversity_prob
    return jnp.where(use, padded, x)


def difgsm(logits_fn, variables, images, labels, eps=8 / 255,
           alpha=2 / 255, steps=10, decay=0.0, resize_rate=0.9,
           diversity_prob=0.5, rng=None, targeted=False):
    """torchattacks/attacks/difgsm.py: MI-FGSM with random
    resize+pad input diversity at each step."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    B, H, W, C = images.shape
    low_h = int(H * resize_rate) if resize_rate < 1 else H
    low_w = int(W * resize_rate) if resize_rate < 1 else W

    def diversify(x, key):
        return _input_diversity(x, key, low_h, low_w, diversity_prob)

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


def _ti_kernel(kernel_name="gaussian", len_kernel=15, nsig=3):
    """Translation-invariance smoothing kernel (tifgsm.py:70-101):
    gaussian (default), uniform, or linear, normalized to sum 1."""
    if kernel_name == "gaussian":
        x = jnp.linspace(-nsig, nsig, len_kernel)
        k1 = jnp.exp(-0.5 * x * x)
        kern = jnp.outer(k1, k1)
    elif kernel_name == "uniform":
        kern = jnp.ones((len_kernel, len_kernel))
    elif kernel_name == "linear":
        r = 1.0 - jnp.abs(
            jnp.linspace(-1.0, 1.0, len_kernel))
        kern = jnp.outer(r, r)
    else:
        raise ValueError(kernel_name)
    return kern / jnp.sum(kern)


def _depthwise_smooth(g, kern):
    """Depthwise SAME conv of NHWC gradient with a 2-D kernel."""
    C = g.shape[-1]
    k = jnp.broadcast_to(kern[:, :, None, None],
                         kern.shape + (1, C)).astype(g.dtype)
    return jax.lax.conv_general_dilated(
        g, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def tifgsm(logits_fn, variables, images, labels, eps=8 / 255,
           alpha=2 / 255, steps=20, decay=0.0, kernel_name="gaussian",
           len_kernel=15, nsig=3, resize_rate=0.9, diversity_prob=0.5,
           random_start=False, rng=None, targeted=False):
    """torchattacks/attacks/tifgsm.py: translation-invariant FGSM —
    MI-FGSM whose gradient is smoothed by a depthwise Gaussian kernel
    (len 15, nsig 3 defaults per the paper), with DI-FGSM-style random
    resize+pad input diversity."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    B, H, W, C = images.shape
    kern = _ti_kernel(kernel_name, len_kernel, nsig)
    low_h = int(H * resize_rate) if resize_rate < 1 else H
    low_w = int(W * resize_rate) if resize_rate < 1 else W

    def diversify(x, key):
        return _input_diversity(x, key, low_h, low_w, diversity_prob)

    adv = images
    if random_start:
        adv = jnp.clip(images + jax.random.uniform(
            rng, images.shape, minval=-eps, maxval=eps), 0.0, 1.0)

    def body(i, carry):
        adv, momentum = carry
        key = jax.random.fold_in(rng, i)

        def loss(a):
            l = jnp.mean(_ce(
                logits_fn(variables, diversify(a, key)), labels))
            return -l if targeted else l

        g = jax.grad(loss)(adv)
        g = _depthwise_smooth(g, kern)
        g = g / (jnp.mean(jnp.abs(g), axis=(1, 2, 3),
                          keepdims=True) + 1e-12)
        g = g + decay * momentum
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - images, -eps, eps)
        return jnp.clip(images + delta, 0.0, 1.0), g

    adv, _ = jax.lax.fori_loop(0, steps, body,
                               (adv, jnp.zeros_like(images)))
    return adv


def _sparsefool_linear_solver(x0, coord_vec, boundary_point):
    """L1-greedy projection onto the linearized boundary
    (sparsefool.py:96-129): walk one max-|w| coordinate at a time until
    the sign of w.(x - x_b) flips, zeroing used coordinates."""
    D = x0.size
    normal = coord_vec.reshape(-1)
    x0f = x0.reshape(-1)
    bpf = boundary_point.reshape(-1)
    sign_true = jnp.sign(jnp.dot(normal, x0f - bpf))
    beta = 0.001 * sign_true

    def cond(carry):
        x_i, cv, _ = carry
        cur = jnp.sign(jnp.dot(normal, x_i - bpf))
        return (cur == sign_true) & jnp.any(cv != 0)

    def body(carry):
        x_i, cv, n = carry
        f_k = jnp.dot(normal, x_i - bpf) + beta
        idx = jnp.argmax(jnp.abs(cv))
        pert = jnp.abs(f_k) / (jnp.abs(cv[idx]) + 1e-12)
        step = jnp.maximum(pert, 1e-4) * jnp.sign(cv[idx])
        x_i = jnp.clip(x_i.at[idx].add(step), 0.0, 1.0)
        return x_i, cv.at[idx].set(0.0), n + 1

    x_i, _, _ = jax.lax.while_loop(
        cond, body, (x0f, normal + 0.0, jnp.asarray(0, jnp.int32)))
    del D
    return x_i.reshape(x0.shape)


def sparsefool(logits_fn, variables, images, labels, steps=20,
               lam=3.0, overshoot=0.02, deepfool_steps=50):
    """torchattacks/attacks/sparsefool.py: sparse (L0) attack — each
    outer step takes a DeepFool boundary point, scales it by `lam`, and
    projects back with the one-coordinate-at-a-time linear solver."""

    def one(img, label):
        def outer_cond(carry):
            i, x, done = carry
            return (i < steps) & (~done)

        def outer_body(carry):
            i, x, _ = carry
            pre0 = jnp.argmax(logits_fn(variables, x[None])[0])
            df, tl = _deepfool_single(
                logits_fn, variables, x, label, deepfool_steps, 0.02)
            x_b = x + lam * (df - x)

            logits_b = logits_fn(variables, x_b[None])[0]
            pre = jnp.argmax(logits_b)
            pre = jnp.where(pre == label, tl, pre)

            def cost(a):
                lg = logits_fn(variables, a[None])[0]
                return lg[pre] - lg[label]

            g = jax.grad(cost)(x_b)
            g = g / (jnp.linalg.norm(g.reshape(-1)) + 1e-12)
            x_new = _sparsefool_linear_solver(img, g, x_b)
            x_new = jnp.clip(
                img + (1 + overshoot) * (x_new - img), 0.0, 1.0)
            # a sample already misclassified keeps its current iterate
            # (sparsefool.py:64-68)
            fooled = pre0 != label
            x = jnp.where(fooled, x, x_new)
            return i + 1, x, fooled

        _, x, _ = jax.lax.while_loop(
            outer_cond, outer_body, (0, img, jnp.asarray(False)))
        return x

    return jax.vmap(one)(images, labels)


def onepixel(logits_fn, variables, images, labels, pixels=1, steps=75,
             popsize=400, rng=None, targeted=False):
    """torchattacks/attacks/onepixel.py: black-box L0 attack optimizing
    (row, col, r, g, b) per pixel with differential evolution.

    The reference drives a vendored SciPy DE port
    (_differential_evolution.py, best1bin, recombination=1, no polish);
    here the same best/1 full-crossover DE runs as a lax.fori_loop with
    the whole population evaluated in one batched forward pass per
    generation, vmapped over the image batch."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    B, H, W, C = images.shape
    D = pixels * (2 + C)
    # scipy population size = popmul * n_dims (onepixel.py:61-62)
    popmul = max(1, popsize // D)
    N = popmul * D
    lo = jnp.tile(jnp.array([0.0, 0.0] + [0.0] * C), pixels)
    hi = jnp.tile(jnp.array([H - 1e-3, W - 1e-3] + [1.0] * C), pixels)

    def perturb(img, member):
        # member: (D,) -> set `pixels` pixels (onepixel.py:125-140)
        out = img
        for p in range(pixels):
            base = p * (2 + C)
            r = member[base].astype(jnp.int32)
            c = member[base + 1].astype(jnp.int32)
            vals = member[base + 2:base + 2 + C]
            out = out.at[r, c, :].set(vals)
        return out

    def fitness(img, label, pop):
        advs = jax.vmap(lambda m: perturb(img, m))(pop)
        probs = jax.nn.softmax(logits_fn(variables, advs), axis=1)
        p = probs[:, label]
        return (1.0 - p) if targeted else p  # minimize

    def one(img, label, key):
        k0, key = jax.random.split(key)
        pop = lo + (hi - lo) * jax.random.uniform(k0, (N, D))
        fit = fitness(img, label, pop)

        def gen(i, carry):
            pop, fit = carry
            kf, k1, k2 = jax.random.split(
                jax.random.fold_in(key, i), 3)
            best = pop[jnp.argmin(fit)]
            # best/1 with dithered F in [0.5, 1) and full crossover
            # (recombination=1 in onepixel.py:86-89)
            F = jax.random.uniform(kf, (), minval=0.5, maxval=1.0)
            r1 = jax.random.randint(k1, (N,), 0, N)
            r2 = jax.random.randint(k2, (N,), 0, N)
            trial = jnp.clip(best[None] + F * (pop[r1] - pop[r2]),
                             lo, hi)
            fit_t = fitness(img, label, trial)
            better = fit_t < fit
            pop = jnp.where(better[:, None], trial, pop)
            fit = jnp.where(better, fit_t, fit)
            return pop, fit

        pop, fit = jax.lax.fori_loop(0, steps, gen, (pop, fit))
        return perturb(img, pop[jnp.argmin(fit)])

    keys = jax.random.split(rng, B)
    return jax.vmap(one)(images, labels, keys)
