"""Tests for the L2 / vanila / arbi / gaussian / light / physical
attacks and the light-simulation physics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.attacks import (
    ArbiObjectAttack, GaussianObjectAttack, L2ObjectAttack,
    LightObjectAttack, PhysicalObjectAttack, PhysObjAttackConfig,
    VanilaObjectAttack,
)
from depthmodelhardening_tpu.attacks.random_object import (
    _blur_hw, _region_mask,
)
from depthmodelhardening_tpu.data.synthetic import make_car_object, make_scene
from depthmodelhardening_tpu.physics.light import (
    simple_add, tube_light_by_func, wavelength_to_rgb,
)

from tests.test_attacks import TinyDepthNet

H, W = 96, 320  # model input (small for CPU CI)
ORI_H, ORI_W = 375, 1242  # native scene size (real calib geometry)
OBJ_H, OBJ_W = 200, 300  # region constants assume reference-scale objects


def _np_wavelength_to_rgb(wavelength, gamma=0.8):
    """Independent numpy port of the reference piecewise formula
    (light_simulation.py:39-86)."""
    w = float(wavelength)
    if 380 <= w <= 440:
        a = 0.3 + 0.7 * (w - 380) / 60
        return ((-(w - 440) / 60 * a) ** gamma, 0.0, a ** gamma)
    if 440 <= w <= 490:
        return (0.0, ((w - 440) / 50) ** gamma, 1.0)
    if 490 <= w <= 510:
        return (0.0, 1.0, (-(w - 510) / 20) ** gamma)
    if 510 <= w <= 580:
        return (((w - 510) / 70) ** gamma, 1.0, 0.0)
    if 580 <= w <= 645:
        return (1.0, (-(w - 645) / 65) ** gamma, 0.0)
    if 645 <= w <= 750:
        a = 0.3 + 0.7 * (750 - w) / 105
        return (a ** gamma, 0.0, 0.0)
    return (0.0, 0.0, 0.0)


def test_wavelength_to_rgb_matches_reference_formula():
    for w in [380, 400, 440, 465, 490, 500, 510, 545, 580, 610, 645,
              700, 750, 360, 770]:
        got = [float(x) for x in wavelength_to_rgb(w)]
        want = _np_wavelength_to_rgb(w)
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"wavelength {w}")


def test_tube_light_matches_reference_loop():
    """Compare against a direct numpy transcription of
    tube_light_generation_by_func (light_simulation.py:124-163)."""
    k, b, alpha, beta, wl = 0.58, 30.0, 1.0, 400.0, 520
    h, w = 40, 60
    got = np.asarray(tube_light_by_func(k, b, alpha, beta, wl, w=w, h=h))

    want = np.zeros((h, w, 3))
    full_end = int(math.sqrt(beta) + 0.5)
    light_end = int(math.sqrt(beta * 20) + 0.5)
    c = _np_wavelength_to_rgb(wl)
    for x in range(w):
        for y in range(h):
            d = abs(k * x - y + b) / math.sqrt(1 + k * k)
            if d <= full_end:
                want[y, x] = [ci * alpha for ci in c]
            elif d <= light_end:
                att = beta / (d * d)
                want[y, x] = [ci * alpha * att for ci in c]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_simple_add_quantizes():
    base = jnp.full((4, 4, 3), 0.5)
    light = jnp.full((4, 4, 3), 0.2)
    out = np.asarray(simple_add(base, light))
    assert np.all(out <= 0.7 + 1e-6)
    # quantized to 1/255 steps
    steps = out * 255.0
    np.testing.assert_allclose(steps, np.floor(steps + 1e-4), atol=1e-3)


def test_blur_hw_matches_scipy():
    from scipy.ndimage import gaussian_filter

    img = np.random.RandomState(0).rand(1, 24, 32, 3).astype(np.float32)
    sigma = 3.0
    got = np.asarray(_blur_hw(jnp.asarray(img), sigma))
    want = gaussian_filter(img, [0, sigma, sigma, 0])
    np.testing.assert_allclose(got, want, atol=2e-5)


class _Pred:
    def __init__(self, tiny):
        self.apply_fn = tiny.predict
        self.variables = tiny.variables


@pytest.fixture(scope="module")
def small_model():
    return _Pred(TinyDepthNet(jax.random.PRNGKey(7)))


def _cfg(**kw):
    return PhysObjAttackConfig(obj_h=OBJ_H, obj_w=OBJ_W,
                               scene_h=H, scene_w=W,
                               ori_h=ORI_H, ori_w=ORI_W, **kw)


@pytest.fixture(scope="module")
def obj_and_scene():
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=5))
    return jnp.asarray(obj), jnp.asarray(mask), scenes


def test_l2_attack_ball_constraint(small_model, obj_and_scene):
    obj, mask, scenes = obj_and_scene
    eps = 2.0
    atk = L2ObjectAttack(small_model.apply_fn, obj, mask, _cfg(),
                         eps=eps, steps=2)
    adv, ben, masks, obj_adv = atk(small_model.variables, scenes, 3,
                                   jax.random.PRNGKey(0), eval_mode=True)
    assert adv.shape == (3, H, W, 3)
    assert obj_adv.shape[0] == 3  # per-sample textures
    delta = np.asarray(obj_adv) - np.asarray(obj)
    norms = np.sqrt((delta.reshape(3, -1) ** 2).sum(axis=1))
    # clip to [0,1] can only shrink the norm
    assert np.all(norms <= eps + 1e-4)
    assert np.isfinite(np.asarray(adv)).all()


def test_vanila_attack_projects_given_texture(small_model, obj_and_scene):
    obj, mask, scenes = obj_and_scene
    atk = VanilaObjectAttack(small_model.apply_fn, obj, mask, _cfg())
    custom = jnp.clip(obj + 0.3, 0, 1)
    adv, ben, masks, obj_out = atk(small_model.variables, scenes, custom,
                                   2, jax.random.PRNGKey(0),
                                   eval_mode=True)
    np.testing.assert_allclose(np.asarray(obj_out), np.asarray(custom))
    # adv differs from ben exactly inside the mask
    diff = np.abs(np.asarray(adv - ben)).max(axis=-1)
    m = np.asarray(masks)[..., 0]
    assert diff[m > 0.5].max() > 1e-3
    assert diff[m < 1e-6].max() < 1e-5


def test_arbi_attack_pattern_region(small_model, obj_and_scene):
    obj, mask, scenes = obj_and_scene
    atk = ArbiObjectAttack(small_model.apply_fn, obj, mask, _cfg())
    adv, ben, masks, obj_adv = atk(small_model.variables, scenes, 4,
                                   jax.random.PRNGKey(1), eval_mode=False)
    region = _region_mask(OBJ_H, OBJ_W)
    delta = np.abs(np.asarray(obj_adv) - np.asarray(obj))
    assert delta[np.broadcast_to(region < 0.5, delta.shape)].max() < 1e-6
    assert delta[np.broadcast_to(region > 0.5, delta.shape)].max() > 1e-3


def test_gaussian_attack_runs(small_model, obj_and_scene):
    obj, mask, scenes = obj_and_scene
    atk = GaussianObjectAttack(small_model.apply_fn, obj, mask, _cfg(),
                               steps=2)
    adv, ben, masks, obj_adv = atk(small_model.variables, scenes, 2,
                                   jax.random.PRNGKey(2), eval_mode=True)
    assert np.isfinite(np.asarray(adv)).all()
    region = _region_mask(OBJ_H, OBJ_W)
    delta = np.abs(np.asarray(obj_adv) - np.asarray(obj))
    assert delta[np.broadcast_to(region < 0.5, delta.shape)].max() < 1e-6


def test_light_attack_picks_best(small_model, obj_and_scene):
    obj, mask, scenes = obj_and_scene
    atk = LightObjectAttack(small_model.apply_fn, obj, mask, _cfg(),
                            n_inits=2, n_neighbors=2)
    adv, ben, masks, obj_adv = atk(small_model.variables, scenes, 2,
                                   jax.random.PRNGKey(3), eval_mode=True)
    assert np.isfinite(np.asarray(adv)).all()
    assert np.asarray(obj_adv).min() >= 0.0
    assert np.asarray(obj_adv).max() <= 1.0


def test_physical_attack_always_pins(small_model, obj_and_scene):
    obj, mask, scenes = obj_and_scene
    adv_obj = jnp.clip(obj * 0.5 + 0.4, 0, 1)
    atk = PhysicalObjectAttack(small_model.apply_fn, obj, mask, adv_obj,
                               _cfg())
    a1 = atk(small_model.variables, scenes, 2, jax.random.PRNGKey(0),
             eval_mode=False)
    a2 = atk(small_model.variables, scenes, 2, jax.random.PRNGKey(0),
             eval_mode=True)
    # pin is unconditional -> identical first-sample composites
    np.testing.assert_allclose(np.asarray(a1[0][0]), np.asarray(a2[0][0]))


def test_apgd_attack_linf_box(small_model, obj_and_scene):
    from depthmodelhardening_tpu.attacks import APGDObjectAttack

    obj, mask, scenes = obj_and_scene
    eps = 0.1
    atk = APGDObjectAttack(small_model.apply_fn, obj, mask, _cfg(),
                           eps=eps, steps=4)
    adv, ben, masks, obj_adv = atk(small_model.variables, scenes, 2,
                                   jax.random.PRNGKey(4), eval_mode=True)
    delta = np.abs(np.asarray(obj_adv) - np.asarray(obj))
    assert delta.max() <= eps + 1e-5
    assert np.asarray(obj_adv).min() >= 0 and np.asarray(obj_adv).max() <= 1
    assert np.isfinite(np.asarray(adv)).all()


def test_square_attack_improves_or_keeps(small_model, obj_and_scene):
    from depthmodelhardening_tpu.attacks import SquareObjectAttack

    obj, mask, scenes = obj_and_scene
    eps = 0.1
    atk = SquareObjectAttack(small_model.apply_fn, obj, mask, _cfg(),
                             eps=eps, n_queries=3)
    adv, ben, masks, obj_adv = atk(small_model.variables, scenes, 2,
                                   jax.random.PRNGKey(5), eval_mode=True)
    delta = np.abs(np.asarray(obj_adv) - np.asarray(obj))
    assert delta.max() <= eps + 1e-5
    assert np.isfinite(np.asarray(adv)).all()


def _targeted_cost(model, obj_tex, obj, mask, scenes, cfg, z0=7.0):
    """Mean masked squared disparity for a fixed EoT placement."""
    eot = cfg.make_eot()
    from depthmodelhardening_tpu.ops.resize import bilinear_resize

    z0s = jnp.full((2,), z0)
    alphas = jnp.zeros((2,))
    sf = jnp.broadcast_to(scenes, (2,) + scenes.shape[1:])
    adv_full, mask_full = eot.project_and_composite(sf, obj_tex, mask,
                                                    z0s, alphas)
    adv = bilinear_resize(adv_full, cfg.scene_h, cfg.scene_w)
    m = bilinear_resize(mask_full, cfg.scene_h, cfg.scene_w)
    disp = model.apply_fn(model.variables, adv)
    return float(jnp.mean((disp * m) ** 2))


def test_pgd_object_attack_reduces_targeted_cost(small_model,
                                                 obj_and_scene):
    """The optimized texture must beat the benign texture on the
    targeted zero-disparity objective at a pinned placement."""
    from depthmodelhardening_tpu.attacks import PGDObjectAttack

    obj, mask, scenes = obj_and_scene
    cfg = _cfg()
    atk = PGDObjectAttack(small_model.apply_fn, obj, mask, cfg,
                          eps=0.3, alpha=0.05, steps=10)
    _, _, _, obj_adv = atk(small_model.variables, scenes, 2,
                           jax.random.PRNGKey(0), eval_mode=True)
    c_ben = _targeted_cost(small_model, obj, obj, mask, scenes, cfg)
    c_adv = _targeted_cost(small_model, obj_adv, obj, mask, scenes, cfg)
    assert c_adv < c_ben, (c_adv, c_ben)


def test_l0_attack_reduces_targeted_cost(small_model, obj_and_scene):
    from depthmodelhardening_tpu.attacks import L0ObjectAttack

    obj, mask, scenes = obj_and_scene
    cfg = _cfg(eval_pin_z0=6.1)
    atk = L0ObjectAttack(small_model.apply_fn, obj, mask, cfg,
                         adam_lr=0.5, steps=5, mask_wt=0.0,
                         l0_thresh=1.0)
    _, _, _, obj_adv = atk(small_model.variables, scenes, 2,
                           jax.random.PRNGKey(0), eval_mode=True)
    c_ben = _targeted_cost(small_model, obj, obj, mask, scenes, cfg,
                           z0=6.1)
    c_adv = _targeted_cost(small_model, obj_adv, obj, mask, scenes,
                           cfg, z0=6.1)
    assert c_adv < c_ben, (c_adv, c_ben)


def test_tube_light_generation_matches_reference_bands():
    """Angle-form tube light (light_simulation.py:164-217): numpy
    transcription of the band-writing loops (including the write-order
    quirk that leaves row total_dist attenuated), then scipy order-1
    rotate as the rotation oracle."""
    from depthmodelhardening_tpu.physics.light import tube_light_generation

    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    alpha, beta, wl = 1.0, 36.0, 520
    h = w = 64
    angle = 17.0

    want = np.zeros((h, w, 3))
    full_end = int(math.sqrt(beta) + 0.5)
    light_end = int(math.sqrt(beta * 10) + 0.5)
    total_dist = light_end + full_end
    total_width = light_end * 2 + full_end
    c = _np_wavelength_to_rgb(wl)
    for y in range(light_end, total_dist + 1):
        want[y, :] = [ci * alpha for ci in c]
    for y in range(light_end + 1):
        d = total_dist - y
        att = beta / (d * d)
        want[y, :] = [ci * alpha * att for ci in c]
        want[total_width - y, :] = [ci * alpha * att for ci in c]
    want = scipy_ndimage.rotate(want, angle, reshape=False, order=1)

    got = np.asarray(tube_light_generation(angle, alpha, beta, wl,
                                           w=w, h=h))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_point_light_is_reference_stub():
    from depthmodelhardening_tpu.physics.light import point_light_generation

    out = np.asarray(point_light_generation(
        {"start_point": (3, 4), "radium": 2}, 1.0, 100.0, 520,
        w=16, h=16))
    assert out.shape == (16, 16, 3)
    assert np.all(out == 0)


def test_gaussian_add_bounds_and_support():
    """Noise is bounded by eps, zero where the pattern is zero, and the
    result is NOT clamped (light_simulation.py:30-38)."""
    import jax

    from depthmodelhardening_tpu.physics.light import gaussian_add

    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    pattern = jnp.zeros((8, 8, 3)).at[:4].set(1.0)
    eps = 128 / 255.0
    out = np.asarray(gaussian_add(base, pattern, jax.random.PRNGKey(0),
                                  eps=eps))
    diff = out - np.asarray(base)
    assert np.all(np.abs(diff) <= eps + 1e-6)
    np.testing.assert_allclose(diff[4:], 0.0, atol=1e-7)
    assert np.abs(diff[:4]).max() > 0.01
