"""Stock classifier-attack surface tests (constraints + effectiveness
on a tiny linear classifier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.attacks import classifier as atk

B, H, W, NC = 4, 8, 8, 3


@pytest.fixture(scope="module")
def model():
    k = jax.random.PRNGKey(0)
    Wm = jax.random.normal(k, (H * W * 3, NC)) * 0.5

    def logits_fn(variables, x):
        return x.reshape(x.shape[0], -1) @ variables

    return logits_fn, Wm


@pytest.fixture(scope="module")
def data():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.uniform(k1, (B, H, W, 3))
    y = jax.random.randint(k2, (B,), 0, NC)
    return x, y


def _acc(logits_fn, v, x, y):
    return float(jnp.mean(jnp.argmax(logits_fn(v, x), 1) == y))


@pytest.mark.parametrize("name,kwargs", [
    ("fgsm", dict(eps=0.1)),
    ("bim", dict(eps=0.1, alpha=0.03, steps=5)),
    ("rfgsm", dict(eps=0.1, alpha=0.03, steps=5)),
    ("pgd", dict(eps=0.1, alpha=0.03, steps=5)),
    ("eotpgd", dict(eps=0.1, alpha=0.03, steps=3, eot_iter=2)),
    ("ffgsm", dict(eps=0.1, alpha=0.15)),
    ("mifgsm", dict(eps=0.1, alpha=0.03, steps=5)),
])
def test_linf_attacks_box_and_effect(model, data, name, kwargs):
    logits_fn, v = model
    x, y = data
    fn = getattr(atk, name)
    adv = fn(logits_fn, v, x, y, **kwargs)
    d = np.abs(np.asarray(adv - x))
    assert d.max() <= kwargs["eps"] + 1e-6
    assert np.asarray(adv).min() >= 0 and np.asarray(adv).max() <= 1
    # untargeted attacks should not increase accuracy
    assert _acc(logits_fn, v, adv, y) <= _acc(logits_fn, v, x, y) + 1e-9


def test_pgdl2_ball(model, data):
    logits_fn, v = model
    x, y = data
    adv = atk.pgdl2(logits_fn, v, x, y, eps=1.0, alpha=0.3, steps=5)
    d = np.asarray(adv - x).reshape(B, -1)
    assert np.all(np.sqrt((d ** 2).sum(1)) <= 1.0 + 1e-4)


def test_tpgd_runs(model, data):
    logits_fn, v = model
    x, _ = data
    adv = atk.tpgd(logits_fn, v, x, eps=0.1, alpha=0.03, steps=3)
    assert np.abs(np.asarray(adv - x)).max() <= 0.1 + 1e-6


def test_gn_vanila(data):
    x, _ = data
    assert np.abs(np.asarray(atk.gn(x, std=0.05) - x)).mean() > 0
    np.testing.assert_allclose(np.asarray(atk.vanila(x)), np.asarray(x))


def test_targeted_mode_moves_toward_target(model, data):
    logits_fn, v = model
    x, y = data
    target = (y + 1) % NC
    adv = atk.pgd(logits_fn, v, x, target, eps=0.3, alpha=0.1, steps=10,
                  targeted=True)
    # targeted accuracy (toward target) should rise vs clean
    t_clean = _acc(logits_fn, v, x, target)
    t_adv = _acc(logits_fn, v, adv, target)
    assert t_adv >= t_clean


def test_cw_reduces_accuracy(model, data):
    logits_fn, v = model
    x, y = data
    adv = atk.cw(logits_fn, v, x, y, c=5.0, steps=30, lr=0.05)
    assert np.asarray(adv).min() >= 0 and np.asarray(adv).max() <= 1
    assert _acc(logits_fn, v, adv, y) <= _acc(logits_fn, v, x, y)


def test_deepfool_flips_labels(model, data):
    logits_fn, v = model
    x, _ = data
    y = jnp.argmax(logits_fn(v, x), 1)  # start from model's own labels
    adv = atk.deepfool(logits_fn, v, x, y, steps=20)
    acc = float(jnp.mean(jnp.argmax(logits_fn(v, adv), 1) == y))
    assert acc < 1.0


def test_difgsm_jitter_upgd_box(model, data):
    logits_fn, v = model
    x, y = data
    for fn, kw in ((atk.difgsm, dict(steps=3)),
                   (atk.jitter, dict(steps=3)),
                   (atk.upgd, dict(steps=3))):
        adv = fn(logits_fn, v, x, y, eps=0.1, alpha=0.05, **kw)
        d = np.abs(np.asarray(adv - x))
        assert d.max() <= 0.1 + 1e-6, fn.__name__
