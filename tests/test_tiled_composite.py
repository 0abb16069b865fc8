"""Tiled model-resolution composite vs the exact native-res path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.attacks.base import PhysObjAttackConfig
from depthmodelhardening_tpu.data.synthetic import make_car_object, make_scene
from depthmodelhardening_tpu.ops.resize import bilinear_resize

H, W = 96, 320
ORI_H, ORI_W = 375, 1242
OBJ_H, OBJ_W = 200, 300


@pytest.fixture(scope="module")
def setup():
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    cfg = PhysObjAttackConfig(obj_h=OBJ_H, obj_w=OBJ_W, scene_h=H,
                              scene_w=W, ori_h=ORI_H, ori_w=ORI_W)
    eot = cfg.make_eot()
    scenes = jnp.asarray(make_scene(2, ORI_H, ORI_W, seed=5))
    return jnp.asarray(obj), jnp.asarray(mask), cfg, eot, scenes


def _paths(eot, scenes, obj, mask, z0s, alphas):
    adv_full, mask_full = eot.project_and_composite(scenes, obj, mask,
                                                    z0s, alphas)
    exact = bilinear_resize(adv_full, H, W)
    exact_m = bilinear_resize(mask_full, H, W)
    scenes_model = bilinear_resize(scenes, H, W)
    fast, fast_m = eot.composite_tiled_model(
        scenes_model, obj, mask, z0s, alphas, model_h=H, model_w=W,
        tile_h=H, tile_w=256)
    return exact, exact_m, fast, fast_m


def test_tiled_matches_exact_closely(setup):
    obj, mask, cfg, eot, scenes = setup
    z0s = jnp.asarray([7.0, 15.0])
    alphas = jnp.asarray([0.0, -20.0])
    exact, exact_m, fast, fast_m = _paths(eot, scenes, obj, mask, z0s,
                                          alphas)
    assert fast.shape == exact.shape
    assert fast_m.shape == exact_m.shape
    # identical away from the object; on/around the object the fast path
    # differs by one-resample-vs-two (sharper edges)
    d = np.abs(np.asarray(fast - exact))
    support = (np.asarray(exact_m) > 1e-4) | (np.asarray(fast_m) > 1e-4)
    off_obj = d[~np.broadcast_to(support, d.shape)]
    assert off_obj.max() < 2e-2  # resize-order differences only
    # on-object content present in both
    assert np.asarray(fast_m).max() > 0.9
    # mean difference small
    assert d.mean() < 5e-3


def test_tiled_mask_localized(setup):
    """Mask must be zero outside the tile / quad region."""
    obj, mask, cfg, eot, scenes = setup
    z0s = jnp.asarray([30.0, 30.0])  # far -> small object
    alphas = jnp.asarray([0.0, 0.0])
    _, exact_m, _, fast_m = _paths(eot, scenes, obj, mask, z0s, alphas)
    fm = np.asarray(fast_m)
    em = np.asarray(exact_m)
    # support overlaps the exact mask support
    inter = ((fm > 0.5) & (em > 0.5)).sum()
    union = ((fm > 0.5) | (em > 0.5)).sum()
    assert union > 0
    assert inter / union > 0.7


def test_tiled_gradient_flows_to_texture(setup):
    obj, mask, cfg, eot, scenes = setup
    z0s = jnp.asarray([7.0, 9.0])
    alphas = jnp.asarray([5.0, -5.0])
    scenes_model = bilinear_resize(scenes, H, W)

    def cost(o):
        adv, m = eot.composite_tiled_model(
            scenes_model, o, mask, z0s, alphas, model_h=H, model_w=W,
            tile_h=H, tile_w=256)
        return jnp.mean((adv * m) ** 2)

    g = jax.grad(cost)(obj)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def _tile_grad(setup_vals, mode):
    obj, mask, cfg, eot, scenes = setup_vals
    scenes_model = bilinear_resize(scenes, H, W)
    z0s = jnp.asarray([5.0, 7.0])  # closest range = worst magnification
    alphas = jnp.asarray([-30.0, 10.0])

    def cost(o):
        adv, m = eot.composite_tiled_model(
            scenes_model, o, mask, z0s, alphas, model_h=H, model_w=W,
            tile_h=H, tile_w=256, adjoint_mode=mode)
        return jnp.mean((adv * m) ** 2) + jnp.mean(adv[:, ::7] ** 2)

    return jax.grad(cost)(obj)


def test_gather_adjoint_matches_autodiff(setup):
    """mode="exact" must equal XLA's scatter-add autodiff gradient."""
    g_exact = _tile_grad(setup, "exact")
    g_ref = _tile_grad(setup, "scatter")
    np.testing.assert_allclose(np.asarray(g_exact), np.asarray(g_ref),
                               atol=1e-6)


def test_approx_adjoint_points_the_same_way(setup):
    """mode="approx" (continuous adjoint) must agree with the exact
    gradient where it matters: matching sign on every significant entry
    and positive global correlation. (Cosine is scale-dependent here:
    at this test's strong minification the exact bilinear adjoint is
    sparse — ~19% nonzero — while the continuous adjoint is its dense
    smoothing, so only direction-of-update is asserted.)"""
    g_ref = np.asarray(_tile_grad(setup, "scatter")).ravel()
    g_apx = np.asarray(_tile_grad(setup, "approx")).ravel()
    cos = np.dot(g_ref, g_apx) / (
        np.linalg.norm(g_ref) * np.linalg.norm(g_apx) + 1e-12)
    assert cos > 0.3, cos
    big = np.abs(g_ref) > np.abs(g_ref).max() * 0.05
    sign_agree = np.mean(np.sign(g_ref[big]) == np.sign(g_apx[big]))
    assert sign_agree > 0.95, sign_agree
