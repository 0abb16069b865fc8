"""Expectation-over-Transformation (EoT) physical patch compositor.

Fully on-device, jit/vmap-compatible re-design of the reference's mixed
numpy/torchvision pipeline (physicalTrans.py:11-196):

  1. A vehicle-mounted textured quad (W=1.82m, H=1.6m, camera at 1.65m,
     physicalTrans.py:41-48) is placed at sampled distance z0 and yaw
     alpha; its 4 corners are projected through KITTI calibration (P2) or
     Monodepth2-style normalized intrinsics (physicalTrans.py:62-105).
     Corner pixel coords are truncated to integers, replicating the
     reference's astype(np.int32) placement quantization
     (physicalTrans.py:75, 186).
  2. An 8-DoF homography mapping the projected quad back to the object's
     resting box is solved in closed form (the same system torchvision's
     perspective() solves) and the object+mask are inverse-warped with
     zero-filled bilinear sampling at scene resolution.
  3. The warped object is alpha-composited: scene*(1-m) + obj*m.

TPU-first differences from the reference (outputs are identical):
  * Instead of zero-padding the object to scene size and warping the
    padded image (physicalTrans.py:107-123), we translate the homography
    by the pad offset and sample the *unpadded* object with zero fill —
    bilinear zeros outside the object box are exactly the pad zeros.
  * Object + mask warp in one sampling pass (channel concat).
  * All control flow is static; (z0, alpha) are traced scalars, so the
    whole EoT->composite->resize->model chain stays inside one XLA
    computation per attack step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import bilinear_sample_pixels

_F32 = jax.lax.Precision.HIGHEST

ORI_H = 375
ORI_W = 1242

# Vehicle quad geometry, physicalTrans.py:35-48 (BMW defaults).
VEH_W = 1.82
VEH_H = 1.6
CAM_H = 1.65

# Object catalogue (physicalTrans.py:35-40): name -> (height_m, width_m).
VEHICLE_SIZES = {
    "BMW": (1.6, 1.82),
    "Sedan": (1.43, 1.78),
    "Subaru": (1.49, 1.83),
    "Truck": (3.0, 2.5),
    "SUV": (1.77, 2.00),
    "TrafficBarrier": (0.75, 1.5),
}


def monodepth2_K(width: int = ORI_W, height: int = ORI_H) -> np.ndarray:
    """The normalized Monodepth2 intrinsics scaled to a resolution
    (mono_dataset.py:170-175)."""
    K = np.array([[0.58, 0, 0.5, 0],
                  [0, 1.92, 0.5, 0],
                  [0, 0, 1, 0],
                  [0, 0, 0, 1]], dtype=np.float32)
    K[0, :] *= width
    K[1, :] *= height
    return K


def quad_corners_world(z0, alpha_deg, veh_w=VEH_W, veh_h=VEH_H,
                       cam_h=CAM_H):
    """Vehicle quad corners in rect-camera coords, order [tl, tr, br, bl].

    physicalTrans.py:83-105: quad centered at x=0, y = cam_h - veh_h/2,
    yawed by alpha around the vertical axis.
    """
    alpha = jnp.deg2rad(alpha_deg)
    x0 = 0.0
    y0 = cam_h - veh_h / 2.0
    x_off = jnp.cos(alpha) * veh_w / 2.0
    z_off = jnp.sin(alpha) * veh_w / 2.0
    x1, x2 = x0 - x_off, x0 + x_off
    zl, zr = z0 - z_off, z0 + z_off
    y1, y2 = y0 - veh_h / 2.0, y0 + veh_h / 2.0
    return jnp.stack([
        jnp.stack([x1, y1, zl]),
        jnp.stack([x2, y1, zr]),
        jnp.stack([x2, y2, zr]),
        jnp.stack([x1, y2, zl]),
    ])  # (4, 3)


def project_corners(world_corners, P, eps: float = 1e-7):
    """(4,3) rect-cam corners -> (4,2) integer-truncated pixel coords.

    P: (3,4) projection (K[:3,:] or K@T[:3,:] or calib P2). The int32
    truncation replicates physicalTrans.py:75/186.
    """
    ones = jnp.ones((4, 1), world_corners.dtype)
    pts = jnp.concatenate([world_corners, ones], axis=1)  # (4, 4)
    cam = jnp.matmul(pts, P.T, precision=_F32)  # (4, 3)
    pix = cam[:, :2] / (cam[:, 2:3] + eps)
    return jnp.trunc(pix)


def _unit_square_to_quad(q):
    """Closed-form 3x3 homography mapping the unit square's corners
    (0,0),(1,0),(1,1),(0,1) to quad q (4,2) in order [tl,tr,br,bl]
    (Heckbert's projective texture-mapping formulas). Pure elementwise
    math — no linear solve, so it compiles/executes on the VPU without
    TPU LU loops."""
    x0, y0 = q[0, 0], q[0, 1]
    x1, y1 = q[1, 0], q[1, 1]
    x2, y2 = q[2, 0], q[2, 1]
    x3, y3 = q[3, 0], q[3, 1]
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    dx1, dy1 = x1 - x2, y1 - y2
    dx2, dy2 = x3 - x2, y3 - y2
    den = dx1 * dy2 - dx2 * dy1
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    g = (sx * dy2 - dx2 * sy) / den
    h = (dx1 * sy - sx * dy1) / den
    affine = (jnp.abs(sx) < 1e-9) & (jnp.abs(sy) < 1e-9)
    g = jnp.where(affine, 0.0, g)
    h = jnp.where(affine, 0.0, h)
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    return jnp.stack([jnp.stack([a, b, x0]),
                      jnp.stack([d, e, y0]),
                      jnp.stack([g, h, jnp.ones_like(g)])])


def _adjugate3(M):
    """3x3 adjugate (inverse up to scale — scale cancels in projective
    coordinates)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    return jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e]),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f]),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d]),
    ])


def solve_homography(endpoints, startpoints):
    """The 8-DoF map sending endpoint pixels -> startpoint pixels.

    Same map torchvision's perspective() solves with an 8x8 system: for
    output pixel (x, y) (endpoint frame), source =
    ((ax+by+c)/(gx+hy+1), (dx+ey+f)/(gx+hy+1)). endpoints/startpoints:
    (4, 2) [x, y] in order [tl, tr, br, bl]. Returns coeffs (8,).

    Computed in closed form as H_start @ adj(H_end) through the unit
    square instead of jnp.linalg.solve — identical result (the
    torchvision-oracle parity tests cover it) but pure VPU math.
    """
    e = endpoints.astype(jnp.float32)
    s = startpoints.astype(jnp.float32)
    H = jnp.matmul(_unit_square_to_quad(s), _adjugate3(
        _unit_square_to_quad(e)), precision=_F32)
    H = H / H[2, 2]
    return jnp.stack([H[0, 0], H[0, 1], H[0, 2],
                      H[1, 0], H[1, 1], H[1, 2],
                      H[2, 0], H[2, 1]])


def perspective_src_coords(coeffs, out_h: int, out_w: int,
                           y0=0.0, x0=0.0):
    """Source pixel coords for each output pixel, torchvision convention.

    torchvision applies the homography to output pixel *centers* (x+0.5,
    y+0.5) and samples grid_sample(align_corners=False), which equals
    sampling input pixel coords (Hx - 0.5, Hy - 0.5).
    (y0, x0): optional (traced) offset of the output window — used by the
    tiled warp to evaluate the map on a sub-rectangle.
    Returns (sx, sy), each (out_h, out_w) float32.
    """
    a, b, c, d, e, f, g, h = [coeffs[i] for i in range(8)]
    xs = jnp.arange(out_w, dtype=jnp.float32) + 0.5 + x0
    ys = jnp.arange(out_h, dtype=jnp.float32) + 0.5 + y0
    x = xs[None, :]
    y = ys[:, None]
    denom = g * x + h * y + 1.0
    sx = (a * x + b * y + c) / denom - 0.5
    sy = (d * x + e * y + f) / denom - 0.5
    return jnp.broadcast_to(sx, (out_h, out_w)), \
        jnp.broadcast_to(sy, (out_h, out_w))


def perspective_warp(img, startpoints, endpoints, out_hw: Tuple[int, int]):
    """Warp img so that startpoints land on endpoints (zero fill).

    img: (B, H, W, C); startpoints/endpoints: (4, 2) (shared across batch)
    or (B, 4, 2). Output: (B, out_h, out_w, C). Matches
    torchvision.transforms.functional.perspective bilinear+fill=0.
    """
    out_h, out_w = out_hw

    def one(img_b, sp, ep):
        coeffs = solve_homography(ep, sp)
        sx, sy = perspective_src_coords(coeffs, out_h, out_w)
        return bilinear_sample_pixels(img_b[None], sx[None], sy[None],
                                      padding_mode="zeros")[0]

    if startpoints.ndim == 2:
        startpoints = jnp.broadcast_to(startpoints,
                                       (img.shape[0],) + startpoints.shape)
    if endpoints.ndim == 2:
        endpoints = jnp.broadcast_to(endpoints,
                                     (img.shape[0],) + endpoints.shape)
    return jax.vmap(one)(img, startpoints, endpoints)


def perspective_apply(coeffs, xs, ys):
    """Apply the 8-coeff map to continuous pixel coords (same half-pixel
    convention as perspective_src_coords): returns mapped (x, y)."""
    a, b, c, d, e, f, g, h = [coeffs[i] for i in range(8)]
    X = xs + 0.5
    Y = ys + 0.5
    denom = g * X + h * Y + 1.0
    return (a * X + b * Y + c) / denom - 0.5, \
        (d * X + e * Y + f) / denom - 0.5


def perspective_jacobian_det(coeffs, xs, ys):
    """|det d(mapped)/d(input)| of the 8-coeff map at pixel coords."""
    a, b, c, d, e, f, g, h = [coeffs[i] for i in range(8)]
    X = xs + 0.5
    Y = ys + 0.5
    D = g * X + h * Y + 1.0
    u = a * X + b * Y + c
    v = d * X + e * Y + f
    dXdx = (a * D - u * g)
    dXdy = (b * D - u * h)
    dYdx = (d * D - v * g)
    dYdy = (e * D - v * h)
    return jnp.abs(dXdx * dYdy - dXdy * dYdx) / (D ** 4)


def _gather2d(img, iy, ix):
    """img (H, W, C); iy/ix int arrays (...,) -> (..., C) gather."""
    H, W = img.shape[:2]
    flat = img.reshape(H * W, -1)
    idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    return jnp.take(flat, idx, axis=0)


def make_tile_sampler(obj_h: int, obj_w: int, tile_h: int, tile_w: int,
                      k_adj: int = 6, mode: str = "approx"):
    """Bilinear tile sampler with fast texture adjoints.

    Forward (all modes): standard zero-fill bilinear sample of the
    object at the tile's per-pixel source coords (the EoT warp).

    Backward w.r.t. the texture — XLA's autodiff adjoint of a gather is
    a scatter-add that runs ~5x slower than the forward on TPU
    (measured: 64 ms fwd vs ~340 ms adjoint at batch 32):

      * "scatter": plain autodiff (the reference-equivalent exact
        gradient, matching torch grid_sample backward).
      * "exact": gather-form exact adjoint — every object pixel gathers
        the k_adj^2 tile pixels whose bilinear support can reach it
        (window centered at its inverse-homography image); equals the
        scatter gradient bit-for-near (valid while magnification stays
        under ~k_adj/2 - 1, true for z0 >= 5 m geometry). Measured
        slower than scatter at k_adj=6 — kept for verification.
      * "approx" (default): continuous-operator adjoint — one jacobian-
        determinant-weighted bilinear gather of the cotangent at the
        inverse-mapped position:
            d_obj[q] ~= |det dJ p/dq| * g(c(q))
        This is the adjoint of the underlying *continuous* warp; it
        differs from the discrete-bilinear adjoint by sub-pixel kernel
        weighting (and spreads gradient smoothly where minification
        makes the exact adjoint sparse). Attack optimizers (FGSM-sign,
        Adam) are insensitive to this reweighting; exact modes remain
        for parity checks.
    """

    def _forward(obj, sx, sy):
        return bilinear_sample_pixels(obj[None], sx[None], sy[None],
                                      padding_mode="zeros")[0]

    @jax.custom_vjp
    def sample(obj, sx, sy, cx, cy, detj):
        return _forward(obj, sx, sy)

    def fwd(obj, sx, sy, cx, cy, detj):
        return _forward(obj, sx, sy), (sx, sy, cx, cy, detj)

    def bwd_exact(res, g):
        sx, sy, cx, cy, _ = res
        stacked = jnp.concatenate(
            [g, sx[..., None], sy[..., None]], axis=-1)
        C = g.shape[-1]
        qx = jnp.arange(obj_w, dtype=jnp.float32)[None, :]
        qy = jnp.arange(obj_h, dtype=jnp.float32)[:, None]
        px0 = jnp.floor(cx).astype(jnp.int32) - (k_adj // 2 - 1)
        py0 = jnp.floor(cy).astype(jnp.int32) - (k_adj // 2 - 1)

        acc = jnp.zeros((obj_h, obj_w, C), jnp.float32)
        for dy in range(k_adj):
            for dx in range(k_adj):
                py = py0 + dy
                px = px0 + dx
                valid = ((py >= 0) & (py < tile_h) &
                         (px >= 0) & (px < tile_w))
                tap = _gather2d(stacked, py, px)
                gs, sxs, sys = tap[..., :C], tap[..., C], tap[..., C + 1]
                w = jnp.maximum(0.0, 1.0 - jnp.abs(sxs - qx)) * \
                    jnp.maximum(0.0, 1.0 - jnp.abs(sys - qy)) * \
                    valid.astype(jnp.float32)
                acc = acc + gs * w[..., None]
        return (acc, None, None, None, None, None)

    def bwd_approx(res, g):
        sx, sy, cx, cy, detj = res
        d = bilinear_sample_pixels(g[None], cx[None], cy[None],
                                   padding_mode="zeros")[0]
        return (d * detj[..., None], None, None, None, None, None)

    sample.defvjp(fwd, bwd_exact if mode == "exact" else bwd_approx)

    if mode == "scatter":
        def scatter_sample(obj, sx, sy, cx, cy, detj):
            return _forward(obj, sx, sy)

        return scatter_sample
    return sample


@dataclasses.dataclass(frozen=True)
class EoTConfig:
    """Static EoT configuration (compile-time constants)."""

    obj_h: int
    obj_w: int
    scene_h: int = ORI_H
    scene_w: int = ORI_W
    veh_w: float = VEH_W
    veh_h: float = VEH_H
    cam_h: float = CAM_H
    # projection: (3,4) numpy array — K[:3,:] (Monodepth2) or calib P2.
    projection: Optional[np.ndarray] = None
    proj_eps: float = 1e-7

    def resolved_projection(self) -> np.ndarray:
        if self.projection is not None:
            return np.asarray(self.projection, np.float32).reshape(3, 4)
        from .calibration import Calibration

        return Calibration.default().P.astype(np.float32)


class EoTCompositor:
    """Batched on-device EoT projector/compositor.

    Replaces PhysicalTrans (physicalTrans.py:11-196). The object's resting
    box ("startpoints") corresponds to the centered zero-padding the
    reference applies (physicalTrans.py:107-123).
    """

    def __init__(self, cfg: EoTConfig):
        self.cfg = cfg
        l_pad = (cfg.scene_w - cfg.obj_w) // 2
        t_pad = (cfg.scene_h - cfg.obj_h) // 2
        # [tl, tr, br, bl] of the object box in the padded scene frame.
        self.startpoints = np.array([
            [l_pad, t_pad],
            [l_pad + cfg.obj_w, t_pad],
            [l_pad + cfg.obj_w, t_pad + cfg.obj_h],
            [l_pad, t_pad + cfg.obj_h],
        ], dtype=np.float32)
        # Warping the unpadded object == warping the padded scene-size
        # object with startpoints shifted to the object's own frame.
        self.startpoints_local = self.startpoints - np.array(
            [[l_pad, t_pad]], dtype=np.float32)
        self.P = jnp.asarray(cfg.resolved_projection())

    # -- geometry ------------------------------------------------------------
    def corners(self, z0, alpha_deg, T: Optional[jnp.ndarray] = None):
        """Projected (4,2) integer-truncated pixel corners for one sample.

        T: optional (4,4) extrinsic applied before projection
        (physicalTrans.py:168-196, stereo other-eye placement).
        """
        world = quad_corners_world(z0, alpha_deg, self.cfg.veh_w,
                                   self.cfg.veh_h, self.cfg.cam_h)
        P = self.P
        if T is not None:
            # P' = K @ T for the K-path; for calib P2 the reference
            # multiplies T into the points instead — same composition.
            P4 = jnp.concatenate(
                [P, jnp.asarray([[0., 0., 0., 1.]], P.dtype)], axis=0)
            P = jnp.matmul(P4, T, precision=_F32)[:3, :]
        return project_corners(world, P, self.cfg.proj_eps)

    # -- warping -------------------------------------------------------------
    def warp_obj_mask(self, obj, mask, z0s, alphas,
                      T: Optional[jnp.ndarray] = None):
        """Project object+mask into the scene for a batch of (z0, alpha).

        obj: (1 or B, obj_h, obj_w, C); mask: (1 or B, obj_h, obj_w, 1).
        z0s/alphas: (B,). T: optional extrinsic, (4,4) shared or (B,4,4)
        per-sample. Returns (obj_scene (B,H,W,C), mask_scene (B,H,W,1)).
        """
        B = z0s.shape[0]
        C = obj.shape[-1]
        stacked = jnp.concatenate(
            [jnp.broadcast_to(obj, (B,) + obj.shape[1:]),
             jnp.broadcast_to(mask, (B,) + mask.shape[1:])], axis=-1)

        out_hw = (self.cfg.scene_h, self.cfg.scene_w)

        def one(img_b, z0, alpha, T_b):
            ep = self.corners(z0, alpha, T_b)
            coeffs = solve_homography(ep, jnp.asarray(self.startpoints))
            sx, sy = perspective_src_coords(coeffs, *out_hw)
            # shift into the unpadded object frame (pad-free warp)
            l_pad = self.startpoints[0, 0]
            t_pad = self.startpoints[0, 1]
            return bilinear_sample_pixels(
                img_b[None], (sx - l_pad)[None], (sy - t_pad)[None],
                padding_mode="zeros")[0]

        if T is not None and T.ndim == 3:
            warped = jax.vmap(one)(stacked, z0s, alphas, T)
        else:
            warped = jax.vmap(
                lambda i, z, a: one(i, z, a, T))(stacked, z0s, alphas)
        return warped[..., :C], warped[..., C:]

    def composite(self, scenes, obj_scene, mask_scene):
        """scene*(1-m) + obj*m (phy_obj_atk.py:88)."""
        return scenes * (1.0 - mask_scene) + obj_scene * mask_scene

    def _separable_geometry(self, z0, alpha, T_b, sx_f, sy_f,
                            model_h, model_w, tile_h, tile_w):
        """Per-sample separable warp parameters.

        The quad projected by `corners` has exactly vertical left/right
        edges (same x and z on each side for yaw-only rotation through a
        zero-skew projection), so the homography's b and h coefficients
        are identically 0 and the source coords factor per column:
          sx(x)    = (a*X + c) / (g*X + 1)          (row-independent)
          sy(x, y) = A(x) * y + B(x),  A = e/(g*X+1)
        with X the global output column. Returns
        (sx_local (TW,), A (TW,), B (TW,), y0, x0).
        """
        ep = self.corners(z0, alpha, T_b)
        ep_m = jnp.stack([(ep[:, 0] + 0.5) * sx_f - 0.5,
                          (ep[:, 1] + 0.5) * sy_f - 0.5], axis=1)
        coeffs = solve_homography(ep_m, jnp.asarray(self.startpoints))
        a, _, c, d, e, f, g, _ = [coeffs[i] for i in range(8)]
        y0 = jnp.clip(jnp.floor(jnp.min(ep_m[:, 1])) - 1.0,
                      0.0, model_h - tile_h)
        x0 = jnp.clip(jnp.floor(jnp.min(ep_m[:, 0])) - 1.0,
                      0.0, model_w - tile_w)
        l_pad = self.startpoints[0, 0]
        t_pad = self.startpoints[0, 1]
        X = jnp.arange(tile_w, dtype=jnp.float32) + 0.5 + x0
        den = g * X + 1.0
        sx = (a * X + c) / den - 0.5 - l_pad
        A = e / den
        B = (d * X + e * (0.5 + y0) + f) / den - 0.5 - t_pad
        return sx, A, B, y0, x0

    def check_bands_fit(self, dist_range, angle_range,
                        model_h: int, model_w: int,
                        tile_h: int, tile_w: int,
                        Ts=(None,), extra_z0=(), extra_alpha=()) -> bool:
        """Trace-time sweep: do the banded pallas_warp kernels'
        accumulation windows (BAND_FWD/BAND_BWD rows) cover every
        geometry this compositor can be asked to warp?

        Sweeps a densified grid over [min, max] of the attack's static
        dist/angle ranges (plus pinned eval values) for each stereo
        extrinsic in Ts, reusing the exact band computation the kernels
        run. The band extrema vary smoothly in (z0, alpha) and the
        8-alignment leaves >=6 rows of slack at the measured worst
        case, so a 61x61 grid is conservative. Callers pass the result
        as `bands_fit` so the per-step lax.cond fallback (and its
        operand copies) compiles away.
        """
        import numpy as np

        from ..ops.pallas_warp import _bwd_bands, _fwd_bands

        # Sweep the hull of EVERYTHING the attack can sample — the
        # exact range values (discrete TRAIN/EVAL grids fall between
        # linspace points) plus any subclass finals extremes
        # (extra_z0/extra_alpha, e.g. the arbi attack's linspace(5,30)
        # whose max exceeds EVAL_DIST_RANGE) — with the 61-point
        # linspace spanning the combined min/max (ADVICE r3 medium).
        z_pts = np.concatenate([
            np.asarray(dist_range, np.float64).ravel(),
            np.asarray(list(extra_z0), np.float64).ravel()])
        a_pts = np.concatenate([
            np.asarray(angle_range, np.float64).ravel(),
            np.asarray(list(extra_alpha), np.float64).ravel()])
        zs = np.concatenate(
            [np.linspace(z_pts.min(), z_pts.max(), 61), z_pts])
        als = np.concatenate(
            [np.linspace(a_pts.min(), a_pts.max(), 61), a_pts])
        zg, ag = np.meshgrid(zs, als)
        z = jnp.asarray(zg.ravel(), jnp.float32)
        a = jnp.asarray(ag.ravel(), jnp.float32)
        sx_f = model_w / self.cfg.scene_w
        sy_f = model_h / self.cfg.scene_h
        oh = self.cfg.obj_h
        ow = self.cfg.obj_w
        ok = True
        for T in Ts:
            geom = jax.vmap(lambda zz, aa: self._separable_geometry(
                zz, aa, T, sx_f, sy_f, model_h, model_w,
                tile_h, tile_w))
            sx, A, B, _, _ = geom(z, a)
            valid = (sx > -1.0) & (sx < float(ow))
            _, fits_f = _fwd_bands(A, B, tile_h, oh, valid)
            _, fits_b = _bwd_bands(A, B, oh, tile_h, valid)
            ok = ok and bool(fits_f) and bool(fits_b)
        return ok

    def tiles_separable(self, textures, mask, z0s, alphas,
                        model_h: int, model_w: int,
                        tile_h: int, tile_w: int,
                        T: Optional[jnp.ndarray] = None,
                        dtype=jnp.float32, bands_fit=None):
        """Separable-warp core WITHOUT the full-frame paste: warp any
        number of textures + the mask in ONE pass (channel concat) and
        return (tiles (B, tile_h, tile_w, sum(C)+1), y0s, x0s) — the
        mask is the LAST channel and (y0s, x0s) are the per-sample
        integer-valued tile offsets in the model frame. Callers that
        only read a window around the object (the cropped attack
        objective, attacks/base.py:_model_view_cropped) consume the
        tiles directly so no full-frame tensor enters their
        differentiated path."""
        from ..ops.pallas_warp import vertical_resample

        oh, ow = self.cfg.obj_h, self.cfg.obj_w
        sx_f = model_w / self.cfg.scene_w
        sy_f = model_h / self.cfg.scene_h

        def geom(z0, alpha, T_b):
            return self._separable_geometry(z0, alpha, T_b, sx_f, sy_f,
                                            model_h, model_w,
                                            tile_h, tile_w)

        if T is not None and T.ndim == 3:
            sxs, As, Bs, y0s, x0s = jax.vmap(geom)(z0s, alphas, T)
        else:
            sxs, As, Bs, y0s, x0s = jax.vmap(
                lambda z, a: geom(z, a, T))(z0s, alphas)

        # pass-1 weights: wx[b, j, x] = tri(sx[b, x] - j); zero-fill
        # outside the object box falls out of the triangular support.
        j = jnp.arange(ow, dtype=jnp.float32)[None, :, None]
        Wx = jnp.maximum(0.0, 1.0 - jnp.abs(sxs[:, None, :] - j))
        Wx = jax.lax.stop_gradient(Wx).astype(dtype)

        lead = max(t.shape[0] for t in textures)
        stacked = jnp.concatenate(
            [jnp.broadcast_to(t, (lead,) + t.shape[1:]) for t in textures]
            + [jnp.broadcast_to(mask, (lead, oh, ow, 1))],
            axis=-1).astype(dtype)
        if stacked.shape[0] == 1:
            inter = jnp.einsum("kjc,bjx->bckx", stacked[0], Wx,
                               preferred_element_type=jnp.float32,
                               precision=_F32)
        else:
            inter = jnp.einsum("bkjc,bjx->bckx", stacked, Wx,
                               preferred_element_type=jnp.float32,
                               precision=_F32)
        # the pallas vertical kernel needs f32 rows (single-row dynamic
        # loads are sublane-aligned at f32 but not at bf16); the warp
        # runs f32 and the tiles are cast to the requested view dtype
        # on the way out — the f32 kernels are already banded-cheap.
        inter = inter.astype(jnp.float32)

        valid = (sxs > -1.0) & (sxs < float(ow))
        tiles = vertical_resample(inter, As, Bs, tile_h,
                                  bands_fit=bands_fit, valid=valid)
        tiles = tiles.astype(dtype)
        return tiles.transpose(0, 2, 3, 1), y0s, x0s  # (B,TH,TW,ΣC+1)

    def _tiled_separable(self, scenes_model, textures, mask,
                         z0s, alphas, model_h: int, model_w: int,
                         tile_h: int, tile_w: int,
                         T: Optional[jnp.ndarray], bands_fit=None):
        """tiles_separable + per-sample paste into the scenes.
        Returns ([comp_per_texture], mask_full)."""
        chans = [t.shape[-1] for t in textures]
        tiles, y0s, x0s = self.tiles_separable(
            textures, mask, z0s, alphas, model_h, model_w,
            tile_h, tile_w, T, dtype=scenes_model.dtype,
            bands_fit=bands_fit)

        def paste(scene_b, tile_b, y0, x0):
            m_t = tile_b[..., -1:]
            start = (y0.astype(jnp.int32), x0.astype(jnp.int32), 0)
            scene_t = jax.lax.dynamic_slice(
                scene_b, start, (tile_h, tile_w, scene_b.shape[-1]))
            comps = []
            off = 0
            for c in chans:
                obj_t = tile_b[..., off:off + c]
                off += c
                comp_t = scene_t * (1.0 - m_t) + obj_t * m_t
                comps.append(jax.lax.dynamic_update_slice(
                    scene_b, comp_t, start))
            mask_full = jax.lax.dynamic_update_slice(
                jnp.zeros(scene_b.shape[:2] + (1,), m_t.dtype), m_t,
                start)
            return tuple(comps), mask_full

        comps, mask_full = jax.vmap(paste)(scenes_model, tiles, y0s,
                                           x0s)
        return list(comps), mask_full

    def composite_tiled_separable(self, scenes_model, obj, mask,
                                  z0s, alphas, model_h: int, model_w: int,
                                  tile_h: int = 256, tile_w: int = 256,
                                  T: Optional[jnp.ndarray] = None,
                                  bands_fit=None):
        """Separable-warp fast path of composite_tiled_model.

        Numerically equal to the 2-D bilinear tile warp (the b=h=0
        factorization is exact, see _separable_geometry) but TPU-shaped:
        pass 1 (horizontal resample) is one MXU matmul over all EoT
        samples, pass 2 (per-column vertical resample) is a VMEM-resident
        Pallas kernel whose custom VJP gives the EXACT texture adjoint as
        a mirrored kernel (ops/pallas_warp.py) — no gathers, no scatters.
        """
        comps, mask_full = self._tiled_separable(
            scenes_model, (obj,), mask, z0s, alphas, model_h, model_w,
            tile_h, tile_w, T, bands_fit=bands_fit)
        return comps[0], mask_full

    def composite_tiled_pair(self, scenes_model, obj_a, obj_b, mask,
                             z0s, alphas, model_h: int, model_w: int,
                             tile_h: int = 256, tile_w: int = 256,
                             T: Optional[jnp.ndarray] = None,
                             bands_fit=None):
        """Composite TWO textures (e.g. adversarial + benign) against
        the same scenes/mask/EoT samples in a single separable warp —
        the finals of every object attack and the current-frame pair of
        the training synthesis share homographies, so warping stacked
        channels halves the warp work. Returns (comp_a, comp_b, mask)."""
        comps, mask_full = self._tiled_separable(
            scenes_model, (obj_a, obj_b), mask, z0s, alphas,
            model_h, model_w, tile_h, tile_w, T, bands_fit=bands_fit)
        return comps[0], comps[1], mask_full

    def composite_tiled_model(self, scenes_model, obj, mask, z0s, alphas,
                              model_h: int, model_w: int,
                              tile_h: int = 256, tile_w: int = 256,
                              T: Optional[jnp.ndarray] = None,
                              adjoint_mode: str = "separable",
                              bands_fit=None):
        """Warp + composite directly at model resolution inside a small
        tile around the object quad.

        TPU-first fast path for attack inner loops: instead of warping
        the object over the full native scene and resizing the composite
        (phy_obj_atk.py:83-90), the resize is folded into the homography
        (scene corners scaled by the half-pixel resize map) and the warp
        is evaluated only on a (tile_h, tile_w) window positioned at the
        quad's bounding box — cutting both the gather count and its
        scatter adjoint (the texture gradient) by the scene/tile area
        ratio. Differences vs the exact path are sub-pixel (one bilinear
        resample instead of two). Exact-path callers: final outputs and
        training-batch synthesis.

        scenes_model: (B, model_h, model_w, 3) — resize(scenes) computed
        by the caller (loop-invariant). obj: (1|B, oh, ow, C).
        Returns (adv_model, mask_model) both full size.

        adjoint_mode "separable" (default) routes to the exact two-pass
        factorization (composite_tiled_separable); "approx"/"exact"/
        "scatter" keep the 2-D gather sampler with the respective
        texture adjoints.
        """
        if adjoint_mode == "separable":
            return self.composite_tiled_separable(
                scenes_model, obj, mask, z0s, alphas, model_h, model_w,
                tile_h, tile_w, T, bands_fit=bands_fit)
        B = z0s.shape[0]
        C = obj.shape[-1]
        oh, ow = self.cfg.obj_h, self.cfg.obj_w
        sx_f = model_w / self.cfg.scene_w
        sy_f = model_h / self.cfg.scene_h
        stacked = jnp.concatenate(
            [jnp.broadcast_to(obj, (B,) + obj.shape[1:]),
             jnp.broadcast_to(mask, (B,) + mask.shape[1:])], axis=-1)

        l_pad = self.startpoints[0, 0]
        t_pad = self.startpoints[0, 1]
        sp_local = jnp.asarray(self.startpoints)
        sampler = make_tile_sampler(oh, ow, tile_h, tile_w,
                                    mode=adjoint_mode)
        qx_pad = jnp.arange(ow, dtype=jnp.float32)[None, :] + l_pad
        qy_pad = jnp.arange(oh, dtype=jnp.float32)[:, None] + t_pad
        qx_pad = jnp.broadcast_to(qx_pad, (oh, ow))
        qy_pad = jnp.broadcast_to(qy_pad, (oh, ow))

        def one(scene_b, img_b, z0, alpha, T_b):
            ep = self.corners(z0, alpha, T_b)
            # compose the torch half-pixel resize into the endpoints:
            # model = (ori + 0.5) * s - 0.5
            ep_m = jnp.stack([(ep[:, 0] + 0.5) * sx_f - 0.5,
                              (ep[:, 1] + 0.5) * sy_f - 0.5], axis=1)
            coeffs = solve_homography(ep_m, sp_local)
            y0 = jnp.clip(jnp.floor(jnp.min(ep_m[:, 1])) - 1.0,
                          0.0, model_h - tile_h)
            x0 = jnp.clip(jnp.floor(jnp.min(ep_m[:, 0])) - 1.0,
                          0.0, model_w - tile_w)
            sxc, syc = perspective_src_coords(coeffs, tile_h, tile_w,
                                              y0=y0, x0=x0)
            # inverse map: object pixel -> tile-local position (window
            # centers / gather positions for the custom adjoints)
            coeffs_inv = solve_homography(sp_local, ep_m)
            cxg, cyg = perspective_apply(coeffs_inv, qx_pad, qy_pad)
            detj = perspective_jacobian_det(coeffs_inv, qx_pad, qy_pad)
            tile = sampler(img_b, sxc - l_pad, syc - t_pad,
                           cxg - x0, cyg - y0, detj)
            obj_t, m_t = tile[..., :C], tile[..., C:]
            start = (y0.astype(jnp.int32), x0.astype(jnp.int32), 0)
            scene_t = jax.lax.dynamic_slice(
                scene_b, start, (tile_h, tile_w, scene_b.shape[-1]))
            comp_t = scene_t * (1.0 - m_t) + obj_t * m_t
            adv = jax.lax.dynamic_update_slice(scene_b, comp_t, start)
            mask_full = jax.lax.dynamic_update_slice(
                jnp.zeros(scene_b.shape[:2] + (1,), m_t.dtype), m_t,
                start)
            return adv, mask_full

        if T is not None and T.ndim == 3:
            return jax.vmap(one)(scenes_model, stacked, z0s, alphas, T)
        return jax.vmap(
            lambda s, i, z, a: one(s, i, z, a, T)
        )(scenes_model, stacked, z0s, alphas)

    def project_and_composite(self, scenes, obj, mask, z0s, alphas,
                              T: Optional[jnp.ndarray] = None,
                              mask_override=None):
        """Full EoT step. When mask_override is given, composite uses it
        (the reference composites the benign texture with the *adversarial*
        pass' masks — phy_obj_atk.py:118-119)."""
        obj_s, mask_s = self.warp_obj_mask(obj, mask, z0s, alphas, T)
        m = mask_s if mask_override is None else mask_override
        return self.composite(scenes, obj_s, m), mask_s


def sample_za(rng, dist_range, angle_range, batch: int):
    """Sample (z0, alpha) batches without replacement (random.sample
    semantics in phy_obj_atk.py:108-109); falls back to with-replacement
    when the batch exceeds the population (the reference would raise)."""
    kz, ka = jax.random.split(rng)
    dist = jnp.asarray(dist_range, jnp.float32)
    ang = jnp.asarray(angle_range, jnp.float32)
    z = jax.random.choice(kz, dist, shape=(batch,),
                          replace=batch > dist.shape[0])
    a = jax.random.choice(ka, ang, shape=(batch,),
                          replace=batch > ang.shape[0])
    return z, a


# Default sampling ranges (my_utils.py:14, physicalTrans.py:13).
TRAIN_DIST_RANGE = np.arange(5, 10, 0.2, dtype=np.float32)
EVAL_DIST_RANGE = np.arange(5, 31, 2, dtype=np.float32)
ANGLE_RANGE = np.arange(-30, 31, 5, dtype=np.float32)


def stereo_T(baseline: float = 0.54, side: str = "l") -> np.ndarray:
    """Stereo extrinsic used for other-eye placement
    (mono_dataset.py:112-117)."""
    T = np.eye(4, dtype=np.float32)
    side_sign = -1.0 if side == "l" else 1.0
    T[0, 3] = side_sign * baseline
    return T
