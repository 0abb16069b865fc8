"""Separable EoT tile warp: factorization parity + exact adjoint.

The separable path (ops/pallas_warp.py + EoTCompositor.composite_tiled_
separable) must match the 2-D gather sampler bit-for-near in both the
forward warp and the texture gradient — the b=h=0 factorization is
exact, so tolerances are float-accumulation only. On CPU these tests
exercise the jnp fallback; the identical-by-construction Pallas kernels
are covered by the on-TPU parity run (scripts/bench_sep_warp.py) and
the driver benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.ops.pallas_warp import (
    _vert_jnp, vertical_resample,
)
from depthmodelhardening_tpu.physics.calibration import Calibration
from depthmodelhardening_tpu.physics.eot import (
    EoTCompositor, EoTConfig, solve_homography, stereo_T,
)

B, OH, OW = 4, 40, 60
MH, MW = 96, 320
TILE = dict(tile_h=64, tile_w=96)


@pytest.fixture(scope="module")
def eot():
    # small-scene compositor needs intrinsics scaled to the scene
    # (full-size KITTI calib would project the quad off-frame)
    from depthmodelhardening_tpu.physics.eot import monodepth2_K

    P = monodepth2_K(width=MW, height=MH)[:3, :].astype(np.float32)
    return EoTCompositor(EoTConfig(obj_h=OH, obj_w=OW, projection=P,
                                   proj_eps=0.0, scene_h=MH, scene_w=MW,
                                   veh_w=1.82, veh_h=1.6))


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    return dict(
        z0s=jnp.asarray(rng.uniform(5, 30, B).astype(np.float32)),
        alphas=jnp.asarray(rng.uniform(-30, 30, B).astype(np.float32)),
        obj=jnp.asarray(rng.rand(1, OH, OW, 3).astype(np.float32)),
        mask=jnp.asarray((rng.rand(1, OH, OW, 1) > 0.3)
                         .astype(np.float32)),
        scenes=jnp.asarray(rng.rand(B, MH, MW, 3).astype(np.float32)),
    )


def test_homography_is_separable(eot):
    """b = h = 0 for the quad geometry through any zero-skew projection,
    including stereo extrinsics — the structural precondition of the
    separable path."""
    sp = jnp.asarray(eot.startpoints)
    for z0 in (5.0, 6.1, 14.0, 30.9):
        for al in (-30.0, 0.0, 17.5):
            for T in (None, jnp.asarray(stereo_T(0.54, "l")),
                      jnp.asarray(stereo_T(0.54, "r"))):
                ep = eot.corners(jnp.float32(z0), jnp.float32(al), T)
                c = solve_homography(ep, sp)
                assert float(jnp.abs(c[1])) == 0.0  # b
                assert float(jnp.abs(c[7])) == 0.0  # h


def test_vertical_resample_matches_manual():
    rng = np.random.RandomState(1)
    inter = jnp.asarray(rng.rand(2, 3, 10, 16).astype(np.float32))
    A = jnp.asarray(rng.uniform(0.5, 1.5, (2, 16)).astype(np.float32))
    Bc = jnp.asarray(rng.uniform(-2, 2, (2, 16)).astype(np.float32))
    th = 12
    out = vertical_resample(inter, A, Bc, th)

    ref = np.zeros((2, 3, th, 16), np.float32)
    it = np.asarray(inter)
    for b in range(2):
        for x in range(16):
            for y in range(th):
                sy = float(A[b, x]) * y + float(Bc[b, x])
                k0 = int(np.floor(sy))
                w1 = sy - k0
                for c in range(3):
                    v = 0.0
                    if 0 <= k0 < 10:
                        v += (1 - w1) * it[b, c, k0, x]
                    if 0 <= k0 + 1 < 10:
                        v += w1 * it[b, c, k0 + 1, x]
                    ref[b, c, y, x] = v
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_vertical_resample_adjoint_exact():
    """The custom VJP (mirrored kernel) equals autodiff of the gather
    formulation."""
    rng = np.random.RandomState(2)
    inter = jnp.asarray(rng.rand(2, 2, 10, 16).astype(np.float32))
    A = jnp.asarray(rng.uniform(0.5, 1.5, (2, 16)).astype(np.float32))
    Bc = jnp.asarray(rng.uniform(-2, 2, (2, 16)).astype(np.float32))
    g = jnp.asarray(rng.rand(2, 2, 12, 16).astype(np.float32))

    def loss_custom(i):
        return jnp.sum(vertical_resample(i, A, Bc, 12) * g)

    def loss_plain(i):
        return jnp.sum(_vert_jnp(i, A, Bc, 12) * g)

    g_custom = jax.grad(loss_custom)(inter)
    g_plain = jax.grad(loss_plain)(inter)
    np.testing.assert_allclose(np.asarray(g_custom),
                               np.asarray(g_plain), atol=1e-5)


def test_separable_composite_matches_2d_sampler(eot, data):
    """Forward parity: exact factorization vs the 2-D bilinear tile."""
    kw = dict(model_h=MH, model_w=MW, **TILE)
    adv_s, m_s = jax.jit(lambda o: eot.composite_tiled_model(
        data["scenes"], o, data["mask"], data["z0s"], data["alphas"],
        adjoint_mode="separable", **kw))(data["obj"])
    adv_r, m_r = jax.jit(lambda o: eot.composite_tiled_model(
        data["scenes"], o, data["mask"], data["z0s"], data["alphas"],
        adjoint_mode="scatter", **kw))(data["obj"])
    assert float(jnp.sum(m_r)) > 0  # the quad must land in-frame
    np.testing.assert_allclose(np.asarray(adv_s), np.asarray(adv_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r),
                               atol=1e-4)


def test_separable_composite_grad_exact(eot, data):
    """Texture-gradient parity vs the autodiff (scatter) adjoint — the
    separable adjoint is exact, unlike the approx continuous adjoint."""
    kw = dict(model_h=MH, model_w=MW, **TILE)

    def loss(mode):
        def f(o):
            adv, m = eot.composite_tiled_model(
                data["scenes"], o, data["mask"], data["z0s"],
                data["alphas"], adjoint_mode=mode, **kw)
            return jnp.sum(adv * jnp.cos(3.0 * adv) + 0.5 * m)
        return jax.jit(jax.grad(f))

    g_s = loss("separable")(data["obj"])
    g_r = loss("scatter")(data["obj"])
    scale = float(jnp.max(jnp.abs(g_r))) + 1e-12
    assert float(jnp.max(jnp.abs(g_s - g_r))) / scale < 1e-4


@pytest.mark.slow
def test_separable_with_stereo_extrinsic(eot, data):
    """Per-sample T (stereo other-eye placement) stays separable."""
    kw = dict(model_h=MH, model_w=MW, **TILE)
    T = jnp.broadcast_to(jnp.asarray(stereo_T(0.54, "l")), (B, 4, 4))
    adv_s, m_s = eot.composite_tiled_model(
        data["scenes"], data["obj"], data["mask"], data["z0s"],
        data["alphas"], T=T, adjoint_mode="separable", **kw)
    adv_r, m_r = eot.composite_tiled_model(
        data["scenes"], data["obj"], data["mask"], data["z0s"],
        data["alphas"], T=T, adjoint_mode="scatter", **kw)
    np.testing.assert_allclose(np.asarray(adv_s), np.asarray(adv_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r),
                               atol=1e-4)


def test_separable_per_sample_objects(eot, data):
    """obj with a real batch dim (per-sample textures, e.g. L0 dual
    patterns evaluated per sample) takes the batched einsum path."""
    rng = np.random.RandomState(3)
    objs = jnp.asarray(rng.rand(B, OH, OW, 3).astype(np.float32))
    kw = dict(model_h=MH, model_w=MW, **TILE)
    adv_s, _ = eot.composite_tiled_model(
        data["scenes"], objs, data["mask"], data["z0s"], data["alphas"],
        adjoint_mode="separable", **kw)
    adv_r, _ = eot.composite_tiled_model(
        data["scenes"], objs, data["mask"], data["z0s"], data["alphas"],
        adjoint_mode="scatter", **kw)
    np.testing.assert_allclose(np.asarray(adv_s), np.asarray(adv_r),
                               atol=1e-4)


def test_composite_tiled_pair_matches_two_singles(eot, data):
    """One stacked warp for (adv, benign) equals two single composites."""
    rng = np.random.RandomState(4)
    obj_b = jnp.asarray(rng.rand(1, OH, OW, 3).astype(np.float32))
    kw = dict(model_h=MH, model_w=MW, **TILE)
    a2, b2, m2 = eot.composite_tiled_pair(
        data["scenes"], data["obj"], obj_b, data["mask"], data["z0s"],
        data["alphas"], **kw)
    a1, m1 = eot.composite_tiled_separable(
        data["scenes"], data["obj"], data["mask"], data["z0s"],
        data["alphas"], **kw)
    b1, _ = eot.composite_tiled_separable(
        data["scenes"], obj_b, data["mask"], data["z0s"],
        data["alphas"], **kw)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-5)


def test_separable_matches_2d_across_random_geometries():
    """Property check: random object sizes, tile sizes, vehicle
    dimensions and projections — the factorization must track the 2-D
    sampler everywhere (not just the fixtures above)."""
    from depthmodelhardening_tpu.physics.eot import monodepth2_K

    rng = np.random.RandomState(7)
    for trial in range(6):
        oh = int(rng.randint(12, 40))
        ow = int(rng.randint(16, 60))
        th = int(rng.choice([32, 48, 64]))
        tw = int(rng.choice([64, 96, 128]))
        veh_w = float(rng.uniform(1.4, 2.5))
        veh_h = float(rng.uniform(0.7, 3.0))
        P = monodepth2_K(width=MW, height=MH)[:3, :].astype(np.float32)
        comp = EoTCompositor(EoTConfig(
            obj_h=oh, obj_w=ow, projection=P, proj_eps=0.0,
            scene_h=MH, scene_w=MW, veh_w=veh_w, veh_h=veh_h))
        z0s = jnp.asarray(rng.uniform(5, 30, 3).astype(np.float32))
        alphas = jnp.asarray(rng.uniform(-30, 30, 3).astype(np.float32))
        obj = jnp.asarray(rng.rand(1, oh, ow, 3).astype(np.float32))
        mask = jnp.asarray((rng.rand(1, oh, ow, 1) > 0.2)
                           .astype(np.float32))
        scenes = jnp.asarray(rng.rand(3, MH, MW, 3).astype(np.float32))
        kw = dict(model_h=MH, model_w=MW, tile_h=th, tile_w=tw)
        a_s, m_s = comp.composite_tiled_model(
            scenes, obj, mask, z0s, alphas, adjoint_mode="separable",
            **kw)
        a_r, m_r = comp.composite_tiled_model(
            scenes, obj, mask, z0s, alphas, adjoint_mode="scatter",
            **kw)
        np.testing.assert_allclose(
            np.asarray(a_s), np.asarray(a_r), atol=1e-4,
            err_msg=f"trial {trial}: oh={oh} ow={ow} tile={th}x{tw} "
                    f"veh={veh_w:.2f}x{veh_h:.2f}")
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r),
                                   atol=1e-4)


def test_band_windows_cover_support():
    """The banded kernels' precomputed 8-aligned windows cover every
    row the 2-tap triangular kernel can touch ON COLUMNS WITH PASS-1
    SUPPORT, over the full EoT geometry grid (support-free columns
    have zero inter/Wx in both directions; the lax.cond fallback
    guards geometries with wider bands)."""
    import numpy as np

    from depthmodelhardening_tpu.ops.pallas_warp import (
        BAND_BWD, BAND_FWD, _bwd_bands, _fwd_bands,
    )
    from depthmodelhardening_tpu.physics.calibration import Calibration
    from depthmodelhardening_tpu.physics.eot import (
        ANGLE_RANGE, EVAL_DIST_RANGE, ORI_H, ORI_W, EoTCompositor,
        EoTConfig, TRAIN_DIST_RANGE,
    )

    P = Calibration.default().P.astype(np.float32)
    eot = EoTCompositor(EoTConfig(
        obj_h=200, obj_w=300, scene_h=ORI_H, scene_w=ORI_W,
        veh_h=1.6, veh_w=1.82, projection=P, proj_eps=0.0))
    mh, mw, th, tw, oh, ow = 320, 1024, 256, 256, 200, 300
    zs, als = np.meshgrid(
        np.concatenate([np.asarray(TRAIN_DIST_RANGE),
                        np.asarray(EVAL_DIST_RANGE)]),
        np.asarray(ANGLE_RANGE))
    geom = jax.vmap(lambda z, a: eot._separable_geometry(
        z, a, None, mw / ORI_W, mh / ORI_H, mh, mw, th, tw))
    sx, A, B, _, _ = geom(jnp.asarray(zs.ravel(), jnp.float32),
                          jnp.asarray(als.ravel(), jnp.float32))
    valid = (sx > -1.0) & (sx < float(ow))
    s_f, fits_f = _fwd_bands(A, B, th, oh, valid)
    s_b, fits_b = _bwd_bands(A, B, oh, th, valid)
    assert bool(fits_f) and bool(fits_b)
    A, B, s_f, s_b, valid = map(np.asarray, (A, B, s_f, s_b, valid))
    ys = np.arange(th)[None, :, None]
    sy = A[:, None, :] * ys + B[:, None, :]  # (N, th, tw)
    for n in range(0, A.shape[0], 37):  # subsample configs
        v = valid[n]
        if not v.any():
            continue
        # nonzero weights on valid columns only
        w_nz = (np.abs(sy[n][None, :, v]
                       - np.arange(oh)[:, None, None]) < 1)
        rows_touched = w_nz.any(axis=2)  # (oh, th)
        for k in range(oh):
            ys_nz = np.nonzero(rows_touched[k])[0]
            if ys_nz.size:
                assert ys_nz.min() >= s_f[n, k]
                assert ys_nz.max() < s_f[n, k] + BAND_FWD
        cols_touched = rows_touched.T  # (th, oh)
        for y in range(th):
            ks_nz = np.nonzero(cols_touched[y])[0]
            if ks_nz.size:
                assert ks_nz.min() >= s_b[n, y]
                assert ks_nz.max() < s_b[n, y] + BAND_BWD
