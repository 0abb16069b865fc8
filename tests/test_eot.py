"""EoT compositor parity vs a torchvision-equivalent torch oracle."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from depthmodelhardening_tpu.physics import (
    EoTCompositor, EoTConfig, monodepth2_K, quad_corners_world,
    project_corners, solve_homography, perspective_warp, stereo_T,
    Calibration,
)
from depthmodelhardening_tpu.data.synthetic import make_car_object, make_scene

RNG = np.random.RandomState(7)


def _torch_perspective(img_nchw, startpoints, endpoints):
    """torchvision.transforms.functional.perspective oracle: solve the
    endpoint->startpoint coeffs (torchvision _get_perspective_coeffs),
    build the half-pixel-center grid, F.grid_sample align_corners=False,
    zero fill."""
    a = torch.zeros(8, 8, dtype=torch.float64)
    b = torch.zeros(8, dtype=torch.float64)
    for i, (e, s) in enumerate(zip(endpoints, startpoints)):
        ex, ey = float(e[0]), float(e[1])
        sx, sy = float(s[0]), float(s[1])
        a[2 * i] = torch.tensor([ex, ey, 1, 0, 0, 0, -sx * ex, -sx * ey])
        a[2 * i + 1] = torch.tensor([0, 0, 0, ex, ey, 1, -sy * ex, -sy * ey])
        b[2 * i] = sx
        b[2 * i + 1] = sy
    coeffs = torch.linalg.solve(a, b)

    _, _, H, W = img_nchw.shape
    oh, ow = H, W
    d = 0.5
    base_x = torch.linspace(d, ow - 1 + d, ow, dtype=torch.float64)
    base_y = torch.linspace(d, oh - 1 + d, oh, dtype=torch.float64)
    y, x = torch.meshgrid(base_y, base_x, indexing="ij")
    denom = coeffs[6] * x + coeffs[7] * y + 1.0
    sx = (coeffs[0] * x + coeffs[1] * y + coeffs[2]) / denom
    sy = (coeffs[3] * x + coeffs[4] * y + coeffs[5]) / denom
    gx = sx / (0.5 * W) - 1.0
    gy = sy / (0.5 * H) - 1.0
    grid = torch.stack([gx, gy], dim=-1)[None].float()
    return F.grid_sample(img_nchw, grid, mode="bilinear",
                         padding_mode="zeros", align_corners=False)


def test_perspective_warp_vs_torch_oracle():
    H, W = 60, 90
    img = RNG.rand(1, H, W, 3).astype(np.float32)
    startpoints = np.array([[10, 8], [70, 8], [70, 50], [10, 50]], np.float32)
    for trial in range(4):
        jitter = RNG.randint(-6, 7, size=(4, 2)).astype(np.float32)
        endpoints = startpoints + jitter
        ours = np.asarray(perspective_warp(
            jnp.asarray(img), jnp.asarray(startpoints),
            jnp.asarray(endpoints), (H, W)))
        ref = _torch_perspective(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            startpoints.tolist(), endpoints.tolist())
        np.testing.assert_allclose(
            ours, ref.permute(0, 2, 3, 1).numpy(), atol=2e-4,
            err_msg=f"trial {trial}")


def test_perspective_identity():
    H, W = 40, 50
    img = RNG.rand(1, H, W, 2).astype(np.float32)
    pts = np.array([[5, 5], [45, 5], [45, 35], [5, 35]], np.float32)
    out = np.asarray(perspective_warp(jnp.asarray(img), jnp.asarray(pts),
                                      jnp.asarray(pts), (H, W)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_quad_corners_world_reference_math():
    """Check against the physicalTrans.py:83-105 trig done in numpy."""
    from math import cos, sin, radians

    z0, alpha = 7.0, 15.0
    veh_w, veh_h, cam_h = 1.82, 1.6, 1.65
    x_off = cos(radians(alpha)) * veh_w / 2
    z_off = sin(radians(alpha)) * veh_w / 2
    y0 = cam_h - veh_h / 2
    expect = np.array([
        [-x_off, y0 - veh_h / 2, z0 - z_off],
        [x_off, y0 - veh_h / 2, z0 + z_off],
        [x_off, y0 + veh_h / 2, z0 + z_off],
        [-x_off, y0 + veh_h / 2, z0 - z_off],
    ], np.float32)
    got = np.asarray(quad_corners_world(jnp.float32(z0), jnp.float32(alpha)))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_project_corners_monodepth2_K():
    """Corner projection matches the numpy math in physicalTrans.py:68-75."""
    K = monodepth2_K()
    z0, alpha = 7.0, 0.0
    world = np.asarray(quad_corners_world(jnp.float32(z0),
                                          jnp.float32(alpha)))
    N = world.shape[0]
    pts = np.concatenate([world.T, np.ones((1, N))], axis=0)
    cam = K[:3, :] @ pts
    expect = (cam[:2] / (cam[[2]] + 1e-7)).T.astype(np.int32)

    got = np.asarray(project_corners(jnp.asarray(world),
                                     jnp.asarray(K[:3, :]))).astype(np.int32)
    np.testing.assert_array_equal(got, expect)


def test_full_eot_composite_matches_reference_flow():
    """End-to-end: our pad-free warp equals the reference's
    pad-to-scene-then-perspective flow (oracle in torch)."""
    obj, mask = make_car_object(width=60, height=40)
    scene = make_scene(1, 375, 1242, seed=3)

    cfg = EoTConfig(obj_h=40, obj_w=60, projection=monodepth2_K()[:3, :])
    eot = EoTCompositor(cfg)

    z0s = jnp.asarray([7.0])
    alphas = jnp.asarray([10.0])
    adv, mask_s = eot.project_and_composite(
        jnp.asarray(scene), jnp.asarray(obj), jnp.asarray(mask), z0s, alphas)

    # oracle: zero-pad object to scene size, torchvision-perspective it.
    l_pad = (1242 - 60) // 2
    t_pad = (375 - 40) // 2
    obj_pad = np.zeros((1, 375, 1242, 4), np.float32)
    obj_pad[:, t_pad:t_pad + 40, l_pad:l_pad + 60, :3] = obj
    obj_pad[:, t_pad:t_pad + 40, l_pad:l_pad + 60, 3:] = mask
    start = [[l_pad, t_pad], [l_pad + 60, t_pad],
             [l_pad + 60, t_pad + 40], [l_pad, t_pad + 40]]
    end = np.asarray(eot.corners(jnp.float32(7.0),
                                 jnp.float32(10.0))).astype(int).tolist()
    warped = _torch_perspective(
        torch.from_numpy(obj_pad).permute(0, 3, 1, 2), start, end)
    warped = warped.permute(0, 2, 3, 1).numpy()
    ref_obj, ref_mask = warped[..., :3], warped[..., 3:]
    ref_adv = scene * (1 - ref_mask) + ref_obj * ref_mask

    np.testing.assert_allclose(np.asarray(mask_s), ref_mask, atol=2e-4)
    np.testing.assert_allclose(np.asarray(adv), ref_adv, atol=2e-4)
    # the object actually landed in the scene
    assert float(jnp.sum(mask_s)) > 100


def test_stereo_projection_shifts_object():
    """Other-eye projection with baseline T shifts the object horizontally
    (mono_dataset.py:112-117 places the stereo view with baseline 0.54)."""
    obj, mask = make_car_object(width=60, height=40)
    cfg = EoTConfig(obj_h=40, obj_w=60, projection=monodepth2_K()[:3, :])
    eot = EoTCompositor(cfg)
    z0s = jnp.asarray([7.0])
    alphas = jnp.asarray([0.0])

    _, m_center = eot.warp_obj_mask(jnp.asarray(obj), jnp.asarray(mask),
                                    z0s, alphas)
    T = jnp.asarray(stereo_T(0.54, "l"))
    _, m_shift = eot.warp_obj_mask(jnp.asarray(obj), jnp.asarray(mask),
                                   z0s, alphas, T=T)

    xs_center = np.where(np.asarray(m_center)[0, :, :, 0] > 0.5)[1]
    xs_shift = np.where(np.asarray(m_shift)[0, :, :, 0] > 0.5)[1]
    # left-eye T has negative x translation -> object moves left in image
    assert xs_shift.mean() < xs_center.mean() - 5


def test_calibration_roundtrips():
    calib = Calibration.default()
    pts = RNG.rand(10, 3) * np.array([5, 2, 30]) + np.array([-2, -1, 5])
    back = calib.rect_to_velo(pts)
    again = calib.velo_to_rect(back)
    np.testing.assert_allclose(again, pts, atol=1e-6)

    uv = calib.rect_to_image(pts)
    rect = calib.image_to_rect(
        np.concatenate([uv, pts[:, 2:3]], axis=1))
    np.testing.assert_allclose(rect[:, 2], pts[:, 2])
    # P2[2,3] != 0 makes rect->image->rect only approximately invertible
    # (the reference's image_to_rect ignores it the same way).
    np.testing.assert_allclose(rect[:, :2], pts[:, :2], atol=0.05)
