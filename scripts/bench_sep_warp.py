"""Micro-benchmark: current gather-based tiled EoT warp vs the separable
two-pass design (pass 1 horizontal resample as an MXU matmul, pass 2
vertical per-column 2-tap gather).

The EoT homographies of this pipeline have exactly b=h=0 (the projected
quad has vertical left/right edges for yaw-only rotations through any
zero-skew projection), so the 2-D bilinear warp factors EXACTLY:
  tile[y,x] = sum_k wy_k(sy(x,y)) * [sum_j wx_j(sx(x)) obj[k,j]].
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from depthmodelhardening_tpu.physics.calibration import Calibration
from depthmodelhardening_tpu.physics.eot import (
    EoTCompositor, EoTConfig, perspective_src_coords, solve_homography,
    perspective_apply, perspective_jacobian_det, make_tile_sampler,
)

B = 32
OH, OW = 200, 300
TH, TW = 256, 256
MH, MW = 320, 1024
C = 4

P = Calibration.default().P.astype(np.float32)
eot = EoTCompositor(EoTConfig(obj_h=OH, obj_w=OW, projection=P, proj_eps=0.0))
SP = jnp.asarray(eot.startpoints)
L_PAD = float(eot.startpoints[0, 0])
T_PAD = float(eot.startpoints[0, 1])
SX_F, SY_F = MW / 1242, MH / 375


def coeffs_and_window(z0, alpha):
    ep = eot.corners(z0, alpha, None)
    ep_m = jnp.stack([(ep[:, 0] + 0.5) * SX_F - 0.5,
                      (ep[:, 1] + 0.5) * SY_F - 0.5], axis=1)
    coeffs = solve_homography(ep_m, SP)
    y0 = jnp.clip(jnp.floor(jnp.min(ep_m[:, 1])) - 1.0, 0.0, MH - TH)
    x0 = jnp.clip(jnp.floor(jnp.min(ep_m[:, 0])) - 1.0, 0.0, MW - TW)
    return coeffs, y0, x0


# ---- current path: full 2-D gather sample --------------------------------

def current_warp(obj, z0s, alphas, mode="approx"):
    sampler = make_tile_sampler(OH, OW, TH, TW, mode=mode)
    qx = jnp.arange(OW, dtype=jnp.float32)[None, :] + L_PAD
    qy = jnp.arange(OH, dtype=jnp.float32)[:, None] + T_PAD
    qx = jnp.broadcast_to(qx, (OH, OW))
    qy = jnp.broadcast_to(qy, (OH, OW))

    def one(z0, alpha):
        coeffs, y0, x0 = coeffs_and_window(z0, alpha)
        sxc, syc = perspective_src_coords(coeffs, TH, TW, y0=y0, x0=x0)
        coeffs_inv = solve_homography(SP, _endpoints(z0, alpha))
        cxg, cyg = perspective_apply(coeffs_inv, qx, qy)
        detj = perspective_jacobian_det(coeffs_inv, qx, qy)
        return sampler(obj, sxc - L_PAD, syc - T_PAD,
                       cxg - x0, cyg - y0, detj)

    return jax.vmap(one)(z0s, alphas)


def _endpoints(z0, alpha):
    ep = eot.corners(z0, alpha, None)
    return jnp.stack([(ep[:, 0] + 0.5) * SX_F - 0.5,
                      (ep[:, 1] + 0.5) * SY_F - 0.5], axis=1)


# ---- separable path -------------------------------------------------------

def sep_warp(obj, z0s, alphas, pass2: str = "take"):
    """obj: (OH, OW, C) shared. Returns (B, TH, TW, C)."""

    def one(z0, alpha):
        coeffs, y0, x0 = coeffs_and_window(z0, alpha)
        a, b_, c, d, e, f, g, h_ = [coeffs[i] for i in range(8)]
        X = jnp.arange(TW, dtype=jnp.float32) + 0.5 + x0          # (TW,)
        den = g * X + 1.0
        sx = (a * X + c) / den - 0.5 - L_PAD                 # (TW,)
        A = e / den                                          # (TW,)
        Bc = (d * X + e * (0.5 + y0) + f) / den - 0.5 - T_PAD  # (TW,)

        # pass 1 weights (OW, TW): wx[j, x] = tri(sx[x] - j)
        j = jnp.arange(OW, dtype=jnp.float32)[:, None]
        Wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[None, :] - j))
        Wx = Wx.astype(obj.dtype)
        # inter[k, x, c] = sum_j obj[k, j, c] Wx[j, x]
        inter = jnp.einsum("kjc,jx->kxc", obj, Wx,
                           preferred_element_type=jnp.float32
                           ).astype(obj.dtype)

        ys = jnp.arange(TH, dtype=jnp.float32)[:, None]            # (TH, 1)
        sy = A[None, :] * ys + Bc[None, :]                   # (TH, TW)
        k0f = jnp.floor(sy)
        w1 = (sy - k0f).astype(obj.dtype)[..., None]
        k0 = k0f.astype(jnp.int32)
        v0ok = ((k0 >= 0) & (k0 < OH)).astype(obj.dtype)[..., None]
        v1ok = ((k0 + 1 >= 0) & (k0 + 1 < OH)).astype(obj.dtype)[..., None]
        k0c = jnp.clip(k0, 0, OH - 1)
        k1c = jnp.clip(k0 + 1, 0, OH - 1)

        if pass2 == "take":
            idx0 = jnp.broadcast_to(k0c[..., None], (TH, TW, C))
            idx1 = jnp.broadcast_to(k1c[..., None], (TH, TW, C))
            v0 = jnp.take_along_axis(inter, idx0, axis=0)
            v1 = jnp.take_along_axis(inter, idx1, axis=0)
        elif pass2 == "flatgather":
            # flatten (k, x) and gather like the current sampler does
            interf = inter.reshape(OH * TW, C)
            xs = jnp.arange(TW, dtype=jnp.int32)[None, :]
            v0 = jnp.take(interf, k0c * TW + xs, axis=0)
            v1 = jnp.take(interf, k1c * TW + xs, axis=0)
        else:
            raise ValueError(pass2)
        return v0 * (1.0 - w1) * v0ok + v1 * w1 * v1ok

    return jax.vmap(one)(z0s, alphas)


def _sync(out):
    """host transfer: block_until_ready does not reliably sync through
    the axon tunnel (cf. bench.py)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(fn, args, iters=20, name=""):
    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    z0s = jnp.asarray(rng.uniform(5, 30, B).astype(np.float32))
    alphas = jnp.asarray(rng.uniform(-30, 30, B).astype(np.float32))

    # parity: the separable factorization must match the 2-D sampler
    obj32 = jnp.asarray(rng.rand(OH, OW, C).astype(np.float32))
    ref = jax.jit(lambda o: current_warp(o, z0s, alphas))(obj32)
    sep = jax.jit(lambda o: sep_warp(o, z0s, alphas, "take"))(obj32)
    err = float(jnp.max(jnp.abs(ref - sep)))
    print(f"parity max|diff| = {err:.3e}")

    for dtype in (jnp.float32, jnp.bfloat16):
        obj = jnp.asarray(rng.rand(OH, OW, C).astype(np.float32)).astype(dtype)
        name = dtype.__name__
        print(f"--- dtype {name}, B={B}, obj {OH}x{OW}, tile {TH}x{TW} ---")

        bench(lambda o: current_warp(o, z0s, alphas), (obj,),
              name=f"current fwd")
        bench(lambda o: sep_warp(o, z0s, alphas, "take"), (obj,),
              name=f"separable fwd (take_along_axis)")
        bench(lambda o: sep_warp(o, z0s, alphas, "flatgather"), (obj,),
              name=f"separable fwd (flat gather)")

        def loss_cur(o):
            return jnp.sum(current_warp(o, z0s, alphas) ** 2)

        def loss_sep(o, p2="take"):
            return jnp.sum(sep_warp(o, z0s, alphas, p2) ** 2)

        bench(jax.grad(loss_cur), (obj,), name="current fwd+adjoint(approx)")
        bench(jax.grad(loss_sep), (obj,),
              name="separable fwd+grad (autodiff scatter)")
        bench(jax.grad(functools.partial(loss_sep, p2="flatgather")), (obj,),
              name="separable fwd+grad flatgather (autodiff)")


if __name__ == "__main__":
    main()
