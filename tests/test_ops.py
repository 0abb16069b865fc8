"""Unit + torch-oracle parity tests for the ops layer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from depthmodelhardening_tpu.ops import (
    disp_to_depth,
    rot_from_axisangle,
    transformation_from_parameters,
    backproject_depth,
    project_3d,
    reproject_coords,
    grid_sample,
    bilinear_resize,
    nearest_upsample2,
    ssim,
    compute_depth_errors,
    compute_errors_masked,
    get_mean_depth_diff,
    reprojection_loss,
    smooth_loss,
)
from depthmodelhardening_tpu.ops.resize import nearest_resize

RNG = np.random.RandomState(0)


def test_disp_to_depth():
    disp = jnp.asarray(RNG.rand(2, 4, 5, 1).astype(np.float32))
    scaled, depth = disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(1.0 / scaled), np.asarray(depth),
                               rtol=1e-6)
    # endpoints: disp=0 -> depth=100, disp=1 -> depth=0.1
    s0, d0 = disp_to_depth(jnp.zeros((1,)), 0.1, 100.0)
    s1, d1 = disp_to_depth(jnp.ones((1,)), 0.1, 100.0)
    assert np.isclose(float(d0[0]), 100.0)
    assert np.isclose(float(d1[0]), 0.1, rtol=1e-5)


def test_rot_from_axisangle_vs_scipy():
    from scipy.spatial.transform import Rotation

    vec = RNG.randn(8, 1, 3).astype(np.float32) * 0.5
    R = np.asarray(rot_from_axisangle(jnp.asarray(vec)))
    R_ref = Rotation.from_rotvec(vec[:, 0, :]).as_matrix()
    np.testing.assert_allclose(R[:, :3, :3], R_ref, atol=1e-5)
    np.testing.assert_allclose(R[:, 3, 3], 1.0)
    np.testing.assert_allclose(R[:, :3, 3], 0.0)


def test_transformation_from_parameters_invert_consistency():
    aa = RNG.randn(4, 1, 3).astype(np.float32) * 0.1
    t = RNG.randn(4, 1, 3).astype(np.float32) * 0.1
    M = np.asarray(transformation_from_parameters(jnp.asarray(aa[:, 0]),
                                                  jnp.asarray(t[:, 0])))
    Minv = np.asarray(transformation_from_parameters(jnp.asarray(aa[:, 0]),
                                                     jnp.asarray(t[:, 0]),
                                                     invert=True))
    prod = np.matmul(M, Minv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def _random_K(B, H, W):
    K = np.zeros((B, 4, 4), np.float32)
    K[:, 0, 0] = 0.58 * W
    K[:, 1, 1] = 1.92 * H
    K[:, 0, 2] = 0.5 * W
    K[:, 1, 2] = 0.5 * H
    K[:, 2, 2] = 1
    K[:, 3, 3] = 1
    return K


def test_backproject_project_identity():
    B, H, W = 2, 6, 9
    K = _random_K(B, H, W)
    inv_K = np.linalg.inv(K)
    depth = (RNG.rand(B, H, W, 1).astype(np.float32) * 10 + 1)
    points = backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K))
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    grid = project_3d(points, jnp.asarray(K), jnp.asarray(T), H, W)
    # identity transform: grid should sample exactly at each pixel center
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    expect_x = (xs / (W - 1) - 0.5) * 2
    expect_y = (ys / (H - 1) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(grid[..., 0]),
                               np.tile(expect_x, (B, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grid[..., 1]),
                               np.tile(expect_y, (B, 1, 1)), atol=1e-4)
    fused = reproject_coords(jnp.asarray(depth), jnp.asarray(inv_K),
                             jnp.asarray(K), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(grid), atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_vs_torch(padding_mode, align_corners):
    B, H, W, C = 2, 7, 11, 3
    img = RNG.rand(B, H, W, C).astype(np.float32)
    grid = (RNG.rand(B, 5, 6, 2).astype(np.float32) * 2.6 - 1.3)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  padding_mode=padding_mode,
                                  align_corners=align_corners))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(grid),
                        mode="bilinear", padding_mode=padding_mode,
                        align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_gradients_flow():
    B, H, W, C = 1, 5, 5, 1
    img = jnp.asarray(RNG.rand(B, H, W, C).astype(np.float32))
    grid = jnp.asarray(RNG.rand(B, 4, 4, 2).astype(np.float32) - 0.5)

    g_img = jax.grad(lambda im: jnp.sum(grid_sample(im, grid) ** 2))(img)
    g_grid = jax.grad(lambda g: jnp.sum(grid_sample(img, g) ** 2))(grid)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_grid)).all()
    assert float(jnp.abs(g_grid).sum()) > 0


def test_bilinear_resize_vs_torch():
    B, H, W, C = 2, 375, 124, 3
    img = RNG.rand(B, H, W, C).astype(np.float32)
    out = np.asarray(bilinear_resize(jnp.asarray(img), 320, 102))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        size=(320, 102), mode="bilinear",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilinear_resize_upsample_vs_torch():
    img = RNG.rand(1, 10, 16, 2).astype(np.float32)
    out = np.asarray(bilinear_resize(jnp.asarray(img), 20, 32))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        size=(20, 32), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)


def test_nearest_upsample2_vs_torch():
    img = RNG.rand(2, 5, 7, 4).astype(np.float32)
    out = np.asarray(nearest_upsample2(jnp.asarray(img)))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        scale_factor=2, mode="nearest")
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy())


def test_nearest_resize_vs_torch():
    img = RNG.rand(1, 9, 13, 2).astype(np.float32)
    out = np.asarray(nearest_resize(jnp.asarray(img), 5, 6))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        size=(5, 6), mode="nearest")
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy())


def _torch_ssim(x, y):
    """Reference SSIM (layers.py:223-253) re-expressed with torch functional
    ops as an oracle."""
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sigma_x = F.avg_pool2d(x ** 2, 3, 1) - mu_x ** 2
    sigma_y = F.avg_pool2d(y ** 2, 3, 1) - mu_y ** 2
    sigma_xy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_vs_torch_oracle():
    B, H, W, C = 2, 12, 17, 3
    x = RNG.rand(B, H, W, C).astype(np.float32)
    y = np.clip(x + RNG.randn(B, H, W, C).astype(np.float32) * 0.1, 0, 1)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_ssim(torch.from_numpy(x).permute(0, 3, 1, 2),
                      torch.from_numpy(y).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)
    # identical images -> zero dissimilarity
    z = np.asarray(ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)


def test_reprojection_loss_weights():
    x = jnp.asarray(RNG.rand(1, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(RNG.rand(1, 8, 8, 3).astype(np.float32))
    full = reprojection_loss(x, y)
    l1_only = reprojection_loss(x, y, use_ssim=False)
    assert full.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(
        np.asarray(l1_only),
        np.abs(np.asarray(x) - np.asarray(y)).mean(-1, keepdims=True),
        atol=1e-6)


def test_reprojection_loss_analytic_backward_matches_autodiff():
    """The fused loss's closed-form VJP (ops/pallas_reproj.py
    _analytic_bwd — elementwise moment-chain + one stacked box-sum)
    vs jax.vjp of the jnp forward, including the clip/abs tie
    conventions on exact-equal pixels."""
    from depthmodelhardening_tpu.ops.pallas_reproj import (
        _analytic_bwd, _jnp_forward,
    )

    x = jnp.asarray(RNG.rand(2, 8, 12, 3).astype(np.float32))
    y = jnp.asarray(RNG.rand(2, 8, 12, 3).astype(np.float32))
    y = y.at[0, 2, 3].set(x[0, 2, 3])  # ties: |.|' and the SSIM clip
    g = jnp.asarray(RNG.randn(2, 8, 12).astype(np.float32))
    _, vjp = jax.vjp(_jnp_forward, x, y)
    gx_ref, gy_ref = vjp(g)
    gx, gy = _analytic_bwd((x, y), g)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref),
                               atol=1e-5)


def test_smooth_loss_zero_for_constant_disp():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.asarray(RNG.rand(1, 8, 8, 3).astype(np.float32))
    assert float(smooth_loss(disp, img)) == 0.0


def test_compute_depth_errors_perfect():
    gt = jnp.asarray(RNG.rand(100).astype(np.float32) * 50 + 1)
    errs = compute_depth_errors(gt, gt)
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = [float(e) for e in errs]
    assert abs_rel == 0 and sq_rel == 0 and rmse == 0 and rmse_log == 0
    assert a1 == a2 == a3 == 1.0


def test_compute_errors_masked_matches_numpy_reference():
    gt = RNG.rand(2, 5, 7, 1).astype(np.float32) * 50 + 1
    pred = gt * (1 + RNG.randn(2, 5, 7, 1).astype(np.float32) * 0.05)
    pred = np.clip(pred, 0.5, None)
    mask = (RNG.rand(2, 5, 7, 1) > 0.5).astype(np.float32)

    ours = [float(v) for v in
            compute_errors_masked(jnp.asarray(gt), jnp.asarray(pred),
                                  jnp.asarray(mask))]
    # numpy oracle per evaluate_depth.py:77-96
    total = mask.sum()
    thresh = np.maximum(gt / pred, pred / gt)
    expect = [
        (np.abs(gt - pred) * mask).sum() / total,
        (np.abs(gt - pred) / gt * mask).sum() / total,
        ((gt - pred) ** 2 / gt * mask).sum() / total,
        np.sqrt(((gt - pred) ** 2 * mask).sum() / total),
        np.sqrt(((np.log(gt) - np.log(pred)) ** 2 * mask).sum() / total),
        ((thresh < 1.25) * mask).sum() / total,
        ((thresh < 1.25 ** 2) * mask).sum() / total,
        ((thresh < 1.25 ** 3) * mask).sum() / total,
    ]
    np.testing.assert_allclose(ours, expect, rtol=1e-5)


def test_get_mean_depth_diff_zero_for_identical():
    disp = jnp.asarray(RNG.rand(2, 8, 8, 1).astype(np.float32))
    assert float(get_mean_depth_diff(disp, disp, use_abs=True)) == 0.0


def test_compute_depth_losses_median_scaled():
    """In-training depth monitor (trainer.py:676-704): median scaling
    absorbs a global scale; smooth field recovers near-zero errors."""
    import jax.numpy as jnp

    from depthmodelhardening_tpu.ops.metrics import compute_depth_losses

    ys, xs = np.mgrid[0:375, 0:1242].astype(np.float32)
    smooth = 10.0 + 30.0 * ys / 375 + 10.0 * np.sin(xs / 200.0)
    gt = np.zeros((2, 375, 1242, 1), np.float32)
    gt[:, 160:360, 100:1100, 0] = smooth[160:360, 100:1100]
    pred = jnp.asarray(smooth[None, ::4, ::4, None].repeat(2, 0) * 1.5)
    m = compute_depth_losses(pred, jnp.asarray(gt))
    assert float(m["de/abs_rel"]) < 0.05
    assert float(m["da/a1"]) > 0.95
    # pixels outside the eigen crop / with zero gt never contribute
    gt2 = gt.copy()
    gt2[:, :150] = 99.0  # above the crop -> must be ignored
    m2 = compute_depth_losses(pred, jnp.asarray(gt2))
    np.testing.assert_allclose(float(m2["de/abs_rel"]),
                               float(m["de/abs_rel"]), atol=1e-6)


def test_reflect_pad1_custom_vjp_exact():
    """ops/padding.py: forward equals jnp.pad(reflect) and the slice-add
    adjoint equals the autodiff of jnp.pad — at several shapes incl. the
    minimal 2x2."""
    import jax

    from depthmodelhardening_tpu.ops.padding import reflect_pad1

    rng = np.random.RandomState(0)
    for (h, w) in ((1, 1), (1, 3), (2, 2), (5, 4), (6, 7)):
        x = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))
        ref = lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                mode="reflect")
        np.testing.assert_allclose(np.asarray(reflect_pad1(x)),
                                   np.asarray(ref(x)))
        g = jnp.asarray(rng.rand(2, h + 2, w + 2, 3).astype(np.float32))
        d_c = jax.grad(lambda x: jnp.sum(reflect_pad1(x) * g))(x)
        d_r = jax.grad(lambda x: jnp.sum(ref(x) * g))(x)
        np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_r),
                                   atol=1e-6)


def test_conv3x3_reflect_same_decomposition_exact():
    """ops/padding.py conv3x3_reflect_same == reflect-pad + VALID conv,
    including corners, at several shapes."""
    import jax

    from depthmodelhardening_tpu.ops.padding import (
        conv3x3_reflect_same, reflect_pad1,
    )

    rng = np.random.RandomState(1)
    P = jax.lax.Precision.HIGHEST
    for (h, w, ci, co) in ((1, 1, 3, 2), (1, 4, 3, 2), (2, 2, 3, 2),
                           (5, 7, 4, 3), (8, 6, 2, 5)):
        x = jnp.asarray(rng.rand(2, h, w, ci).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            reflect_pad1(x), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=P)
        got = conv3x3_reflect_same(x, k, precision=P)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
        # gradient parity (input + kernel)
        g = jnp.asarray(rng.rand(*ref.shape).astype(np.float32))
        dref = jax.grad(lambda x, k: jnp.sum(jax.lax.conv_general_dilated(
            reflect_pad1(x), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=P) * g),
            argnums=(0, 1))(x, k)
        dgot = jax.grad(lambda x, k: jnp.sum(
            conv3x3_reflect_same(x, k, precision=P) * g),
            argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(dgot[0]),
                                   np.asarray(dref[0]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dgot[1]),
                                   np.asarray(dref[1]), atol=2e-5)


def test_max_pool_3x3_s2_parity():
    """ops/pooling.py custom-VJP pool == nn.max_pool + its autodiff
    (S&S) on continuous inputs, even and odd extents. NOTE: measured
    SLOWER than S&S on TPU (scripts/bench_hotspots.py) — kept as a
    tested experiment, not wired into the models."""
    import flax.linen as nn

    from depthmodelhardening_tpu.ops.pooling import max_pool_3x3_s2

    rng = np.random.RandomState(0)
    for shape in ((2, 8, 10, 3), (1, 16, 12, 4), (2, 7, 9, 2)):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        pool_ref = lambda x: nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        np.testing.assert_array_equal(np.asarray(max_pool_3x3_s2(x)),
                                      np.asarray(pool_ref(x)))
        g = jnp.asarray(rng.rand(*pool_ref(x).shape).astype(np.float32))
        dref = jax.grad(lambda x: jnp.sum(pool_ref(x) * g))(x)
        dgot = jax.grad(lambda x: jnp.sum(max_pool_3x3_s2(x) * g))(x)
        np.testing.assert_allclose(np.asarray(dgot), np.asarray(dref),
                                   atol=1e-6)


def test_grid_sample_rows_matches_generic():
    """bilinear_sample_rows (MXU one-hot contraction) vs the generic
    4-tap gather sampler on row-aligned grids: values, coordinate
    gradients, and image gradients (border excursions included)."""
    from depthmodelhardening_tpu.ops.sampling import (
        grid_sample, grid_sample_rows,
    )

    k = jax.random.PRNGKey(0)
    B, H, W, C = 2, 12, 40, 3
    img = jax.random.uniform(k, (B, H, W, C), jnp.float32)
    gx = jax.random.uniform(jax.random.fold_in(k, 1), (B, H, W),
                            minval=-1.3, maxval=1.3)
    gy = jnp.broadcast_to(jnp.linspace(-1, 1, H)[None, :, None],
                          (B, H, W))
    grid = jnp.stack([gx, gy], axis=-1)
    a = grid_sample(img, grid, padding_mode="border",
                    align_corners=True)
    b = grid_sample_rows(img, gx, align_corners=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-6)
    ga = jax.grad(lambda g: jnp.sum(jnp.sin(grid_sample(
        img, jnp.stack([g, gy], -1), "border", True))))(gx)
    gb = jax.grad(lambda g: jnp.sum(jnp.sin(
        grid_sample_rows(img, g, True))))(gx)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=1e-4)
    ia = jax.grad(lambda im: jnp.sum(jnp.sin(grid_sample(
        im, grid, "border", True))))(img)
    ib = jax.grad(lambda im: jnp.sum(jnp.sin(
        grid_sample_rows(im, gx, True))))(img)
    np.testing.assert_allclose(np.asarray(ib), np.asarray(ia),
                               atol=2e-5)
