"""AutoAttack-family classifier attacks (APGD/APGDT/FAB/Square/
AutoAttack/MultiAttack) plus TIFGSM/SparseFool/OnePixel: constraint and
effectiveness tests on a tiny linear classifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.attacks import classifier as atk
from depthmodelhardening_tpu.attacks import classifier_auto as auto

B, H, W, NC = 4, 8, 8, 4


@pytest.fixture(scope="module")
def model():
    k = jax.random.PRNGKey(0)
    Wm = jax.random.normal(k, (H * W * 3, NC)) * 0.5

    def logits_fn(variables, x):
        return x.reshape(x.shape[0], -1) @ variables

    return logits_fn, Wm


@pytest.fixture(scope="module")
def data(model):
    logits_fn, v = model
    k1 = jax.random.PRNGKey(1)
    x = jax.random.uniform(k1, (B, H, W, 3))
    # start from the model's own predictions so every sample is
    # "correctly classified" — the regime the minimal-norm attacks
    # (FAB, SparseFool) are defined in
    y = jnp.argmax(logits_fn(v, x), 1)
    return x, y


def _acc(logits_fn, v, x, y):
    return float(jnp.mean(jnp.argmax(logits_fn(v, x), 1) == y))


def test_apgd_linf_box_and_effect(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.apgd(logits_fn, v, x, y, eps=0.1, steps=20)
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.1 + 1e-6
    assert adv.min() >= 0 and adv.max() <= 1
    assert _acc(logits_fn, v, adv, y) < 1.0


def test_apgd_l2_ball(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.apgd(logits_fn, v, x, y, norm="L2", eps=1.0, steps=20)
    n = jnp.sqrt(jnp.sum((adv - x).reshape(B, -1) ** 2, 1))
    assert float(jnp.max(n)) <= 1.0 + 1e-4
    assert _acc(logits_fn, v, adv, y) < 1.0


def test_apgd_dlr_loss_runs(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.apgd(logits_fn, v, x, y, eps=0.1, steps=10, loss="dlr")
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.1 + 1e-6


def test_apgdt_fools_all_on_linear(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.apgdt(logits_fn, v, x, y, eps=0.15, steps=20,
                     n_classes=NC)
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.15 + 1e-6
    assert _acc(logits_fn, v, adv, y) < 1.0


def test_fab_finds_small_perturbation(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.fab(logits_fn, v, x, y, norm="Linf", eps=0.3, steps=20)
    # FAB is minimal-norm: whenever it fools a sample the perturbation
    # must be within eps; unfooled samples return the original
    flipped = jnp.argmax(logits_fn(v, adv), 1) != y
    assert bool(jnp.any(flipped))
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.3 + 1e-5
    assert adv.min() >= 0 and adv.max() <= 1


def test_fab_l2(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.fab(logits_fn, v, x, y, norm="L2", eps=2.0, steps=15)
    n = jnp.sqrt(jnp.sum((adv - x).reshape(B, -1) ** 2, 1))
    assert float(jnp.max(n)) <= 2.0 + 1e-4
    assert bool(jnp.any(jnp.argmax(logits_fn(v, adv), 1) != y))


def test_proj_box_hyperplane_satisfies_constraint():
    k = jax.random.PRNGKey(3)
    x = jax.random.uniform(k, (10,))
    w = jax.random.normal(jax.random.fold_in(k, 1), (10,))
    b = jnp.sum(w * x) - 0.5  # reachable offset
    for norm in ("Linf", "L2"):
        d = auto._proj_box_hyperplane(x, w, b, norm)
        z = x + d
        assert float(jnp.abs(jnp.sum(w * z) - b)) < 1e-3
        assert z.min() >= -1e-6 and z.max() <= 1 + 1e-6


def test_square_box_and_improvement(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.square(logits_fn, v, x, y, eps=0.1, n_queries=100,
                      p_init=0.8)
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.1 + 1e-6
    assert adv.min() >= 0 and adv.max() <= 1
    assert _acc(logits_fn, v, adv, y) <= _acc(logits_fn, v, x, y)


def test_square_l2_ball_and_improvement(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.square(logits_fn, v, x, y, norm="L2", eps=1.0,
                      n_queries=60, p_init=0.8)
    n = jnp.sqrt(jnp.sum((adv - x).reshape(B, -1) ** 2, 1))
    assert float(jnp.max(n)) <= 1.0 + 1e-4
    assert adv.min() >= 0 and adv.max() <= 1
    assert _acc(logits_fn, v, adv, y) <= _acc(logits_fn, v, x, y)


def test_square_eta_pattern_properties():
    pat = auto._eta(9)
    assert pat.shape == (9, 9)
    # unit L2 norm, +/- halves
    assert abs(float((pat ** 2).sum()) - 1.0) < 1e-5
    assert (pat[:4] >= 0).all() and (pat[4:] <= 0).all()


def test_multiattack_keeps_first_success(model, data):
    logits_fn, v = model
    x, y = data
    calls = []

    def weak(xx, yy):
        calls.append("weak")
        return xx  # never fools

    def strong(xx, yy):
        calls.append("strong")
        return auto.apgd(logits_fn, v, xx, yy, eps=0.15, steps=15)

    adv = auto.multiattack([weak, strong], logits_fn, v, x, y)
    assert calls == ["weak", "strong"]
    assert _acc(logits_fn, v, adv, y) < 1.0
    # samples the ensemble failed on stay at the original image
    failed = jnp.argmax(logits_fn(v, adv), 1) == y
    assert bool(jnp.all(jnp.where(
        failed[:, None, None, None], adv == x, True)))


def test_autoattack_standard(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.autoattack(logits_fn, v, x, y, eps=0.15, n_classes=NC,
                          square_queries=50)
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.15 + 1e-5
    assert _acc(logits_fn, v, adv, y) < 1.0


def test_tifgsm_box_and_effect(model, data):
    logits_fn, v = model
    x, y = data
    adv = atk.tifgsm(logits_fn, v, x, y, eps=0.1, alpha=0.03, steps=5,
                     len_kernel=5, nsig=3)
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.1 + 1e-6
    assert adv.min() >= 0 and adv.max() <= 1
    assert _acc(logits_fn, v, adv, y) <= _acc(logits_fn, v, x, y) + 1e-9


def test_deepfool_returns_target_labels(model, data):
    logits_fn, v = model
    x, y = data
    adv, tl = atk.deepfool(logits_fn, v, x, y, steps=20,
                           return_target_labels=True)
    assert tl.shape == (B,)
    flipped = jnp.argmax(logits_fn(v, adv), 1) != y
    assert bool(jnp.any(flipped))


def test_sparsefool_is_sparse_and_fools(model, data):
    logits_fn, v = model
    x, y = data
    adv = atk.sparsefool(logits_fn, v, x, y, steps=10,
                         deepfool_steps=20)
    acc = _acc(logits_fn, v, adv, y)
    assert acc < 1.0
    # perturbation should touch only a small fraction of coordinates
    changed = jnp.sum(jnp.abs(adv - x) > 1e-6, axis=(1, 2, 3))
    fooled = jnp.argmax(logits_fn(v, adv), 1) != y
    frac = changed / (H * W * 3)
    assert float(jnp.max(jnp.where(fooled, frac, 0.0))) < 0.5


def test_onepixel_changes_at_most_k_pixels(model, data):
    logits_fn, v = model
    x, y = data
    adv = atk.onepixel(logits_fn, v, x, y, pixels=2, steps=8,
                       popsize=40)
    diff = jnp.any(jnp.abs(adv - x) > 1e-6, axis=-1)  # (B, H, W)
    assert int(jnp.max(jnp.sum(diff, axis=(1, 2)))) <= 2
    assert adv.min() >= 0 and adv.max() <= 1
    # DE minimizes the true-class probability
    p_clean = jax.nn.softmax(logits_fn(v, x), 1)
    p_adv = jax.nn.softmax(logits_fn(v, adv), 1)
    idx = jnp.arange(B)
    assert float(jnp.mean(p_adv[idx, y])) <= \
        float(jnp.mean(p_clean[idx, y])) + 1e-6


def test_fab_targeted(model, data):
    logits_fn, v = model
    x, y = data
    adv = auto.fab(logits_fn, v, x, y, norm="Linf", eps=0.3, steps=15,
                   targeted=True, n_classes=NC)
    flipped = jnp.argmax(logits_fn(v, adv), 1) != y
    assert bool(jnp.any(flipped))
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.3 + 1e-5


def test_apgd_eot_iter_matches_deterministic(model, data):
    logits_fn, v = model
    x, y = data
    a1 = auto.apgd(logits_fn, v, x, y, eps=0.1, steps=8, eot_iter=1)
    a3 = auto.apgd(logits_fn, v, x, y, eps=0.1, steps=8, eot_iter=3)
    # deterministic model: averaged gradient == single gradient
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a1),
                               rtol=1e-5, atol=1e-6)


def test_autoattack_versions(model, data):
    logits_fn, v = model
    x, y = data
    for version in ("rand",):
        adv = auto.autoattack(logits_fn, v, x, y, eps=0.15,
                              n_classes=NC, version=version)
        assert float(jnp.max(jnp.abs(adv - x))) <= 0.15 + 1e-5
        assert _acc(logits_fn, v, adv, y) < 1.0
    with pytest.raises(ValueError):
        auto.autoattack(logits_fn, v, x, y, version="bogus")


def test_apgd_stochastic_model_and_rand_version(model, data):
    logits_fn, v = model
    x, y = data

    def noisy_fn(variables, xx, rng=None):
        logits = logits_fn(variables, xx)
        if rng is not None:
            logits = logits + 0.01 * jax.random.normal(
                rng, logits.shape)
        return logits

    adv = auto.apgd(noisy_fn, v, x, y, eps=0.1, steps=6, eot_iter=2)
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.1 + 1e-6
    # the rand ensemble drives the stochastic path end-to-end
    adv2 = auto.autoattack(noisy_fn, v, x, y, eps=0.15, n_classes=NC,
                           version="rand")
    assert float(jnp.max(jnp.abs(adv2 - x))) <= 0.15 + 1e-5


def test_apgd_checkpoint_schedule_matches_counter3():
    """_apgd_checkpoints must reproduce the reference's counter3 loop
    (apgd.py:85,131,192-211): k starts at ceil(0.22*steps), a
    checkpoint fires when counter3 == k (i.e. at loop index i = k-1
    after the first window), counter3 resets, and k shrinks by
    0.03*steps to a floor of 0.06*steps. The oscillation window at
    each checkpoint is the k in force there."""
    from depthmodelhardening_tpu.attacks.classifier_auto import (
        _apgd_checkpoints,
    )

    for steps in (10, 25, 50, 100, 250):
        # pure-python transcription of the reference loop
        n2 = max(int(0.22 * steps), 1)
        nmin = max(int(0.06 * steps), 1)
        decr = max(int(0.03 * steps), 1)
        k, counter3 = n2, 0
        want = {}
        for i in range(steps):
            counter3 += 1
            if counter3 == k:
                want[i] = k
                counter3 = 0
                k = max(k - decr, nmin)

        mask, win = _apgd_checkpoints(steps)
        got = {i: int(win[i]) for i in range(steps) if bool(mask[i])}
        assert got == want, (steps, got, want)
