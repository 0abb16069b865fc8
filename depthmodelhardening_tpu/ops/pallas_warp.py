"""Separable EoT tile warp — pass 2 (vertical per-column resample).

The EoT homographies of this pipeline map the object's axis-aligned box
to a trapezoid with exactly vertical left/right edges: the quad corners
share x (and z) along each side for yaw-only rotations through any
zero-skew projection (physicalTrans.py:83-105 geometry), so the 8-DoF
coefficients have b = h = 0 identically. The 2-D bilinear warp then
factors EXACTLY (no Catmull-Smith approximation):

    tile[y, x] = sum_k wy_k(A[x]*y + B[x]) * inter[k, x]
    inter[k, x] = sum_j wx_j(sx[x]) * obj[k, j]

Pass 1 (horizontal) is a dense matmul on the MXU (ops-level einsum in
physics/eot.py). This module implements pass 2, whose XLA form is a
per-column gather — an op XLA lowers element-wise on TPU (~30 ms at the
attack shapes, measured). The Pallas kernel instead accumulates the
2-tap triangular kernel over object rows with everything VMEM-resident:
for each object row k, w_k = max(0, 1 - |A*y + B - k|) is a VPU
compare and the update is C fused multiply-adds over the (TH, TW) tile.
The backward pass is the same loop with y and k swapped, which makes
the texture adjoint EXACT (the autodiff scatter it replaces was ~5x the
forward cost; the previous production path used an approximate
continuous adjoint — this kernel is both faster and exact).

Non-TPU backends fall back to a jnp gather formulation (identical
results; used by the virtual-CPU-mesh dryrun and CI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .dispatch import pallas_available


def _vert_fwd_kernel(a_ref, b_ref, inter_ref, out_ref, acc_ref, *,
                     loop_rows: int, out_rows: int):
    """out[c, y, x] = sum_k max(0, 1-|A[x]*y+B[x] - k|) * inter[c, k, x]."""
    C = inter_ref.shape[1]
    TW = inter_ref.shape[3]
    A = a_ref[0, 0, :].reshape(1, TW)
    B = b_ref[0, 0, :].reshape(1, TW)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, TW), 0).astype(jnp.float32)
    sy = A * rows + B  # (out_rows, TW)

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def body(k, _):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(sy - k.astype(jnp.float32)))
        for c in range(C):
            row = inter_ref[0, c, k, :].reshape(1, TW).astype(jnp.float32)
            acc_ref[c] += w * row
        return 0

    jax.lax.fori_loop(0, loop_rows, body, 0)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _vert_bwd_kernel(a_ref, b_ref, g_ref, out_ref, acc_ref, *,
                     loop_rows: int, out_rows: int):
    """Exact transpose: d_inter[c,k,x] = sum_y w(y,k,x) * g[c,y,x]."""
    C = g_ref.shape[1]
    TW = g_ref.shape[3]
    A = a_ref[0, 0, :].reshape(1, TW)
    B = b_ref[0, 0, :].reshape(1, TW)
    ks = jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, TW), 0).astype(jnp.float32)

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def body(y, _):
        sy = A * y.astype(jnp.float32) + B  # (1, TW)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(sy - ks))  # (out_rows, TW)
        for c in range(C):
            g = g_ref[0, c, y, :].reshape(1, TW).astype(jnp.float32)
            acc_ref[c] += w * g
        return 0

    jax.lax.fori_loop(0, loop_rows, body, 0)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _pallas_vert(kernel, inter, A, B, out_rows: int, loop_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn, C, _, TW = inter.shape
    # A/B ride as (B, 1, TW): the TPU lowering requires the last two
    # block dims to be 8/128-aligned or equal to the array dims.
    return pl.pallas_call(
        functools.partial(kernel, loop_rows=loop_rows,
                          out_rows=out_rows),
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec((1, 1, TW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, inter.shape[2], TW),
                         lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, out_rows, TW),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, C, out_rows, TW),
                                       inter.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, out_rows, TW), jnp.float32)],
    )(A.astype(jnp.float32)[:, None, :],
      B.astype(jnp.float32)[:, None, :], inter)


def _vert_jnp(inter, A, B, th: int):
    """jnp fallback: 2-tap gather along rows (CPU/GPU and parity tests)."""
    Bn, C, OH, TW = inter.shape
    ys = jnp.arange(th, dtype=jnp.float32)[None, :, None]
    sy = A[:, None, :] * ys + B[:, None, :]  # (B, TH, TW)
    k0f = jnp.floor(sy)
    w1 = (sy - k0f).astype(inter.dtype)[:, None]  # (B, 1, TH, TW)
    k0 = k0f.astype(jnp.int32)
    ok0 = ((k0 >= 0) & (k0 < OH)).astype(inter.dtype)[:, None]
    ok1 = ((k0 + 1 >= 0) & (k0 + 1 < OH)).astype(inter.dtype)[:, None]
    idx0 = jnp.clip(k0, 0, OH - 1)[:, None]
    idx1 = jnp.clip(k0 + 1, 0, OH - 1)[:, None]
    idx0 = jnp.broadcast_to(idx0, (Bn, C, th, TW))
    idx1 = jnp.broadcast_to(idx1, (Bn, C, th, TW))
    v0 = jnp.take_along_axis(inter, idx0, axis=2)
    v1 = jnp.take_along_axis(inter, idx1, axis=2)
    return v0 * (1.0 - w1) * ok0 + v1 * w1 * ok1


def vertical_resample(inter, A, B, th: int):
    """Per-column vertical 1-D bilinear resample (pass 2 of the
    separable EoT warp).

    inter: (B, C, OH, TW) — pass-1 output, channel-major.
    A, B:  (B, TW) float32 per-column affine row maps; source row for
           output (y, x) is A[x]*y + B[x] (zero fill outside [0, OH)).
    Returns (B, C, th, TW) in inter's dtype. Differentiable w.r.t.
    inter (exact mirrored-kernel adjoint); A/B get zero cotangents.
    """
    return _vertical_resample(inter, A, B, th, inter.shape[2])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _vertical_resample(inter, A, B, th: int, oh: int):
    if pallas_available():
        return _pallas_vert(_vert_fwd_kernel, inter, A, B,
                            out_rows=th, loop_rows=oh)
    return _vert_jnp(inter, A, B, th)


def _vr_fwd(inter, A, B, th, oh):
    return _vertical_resample(inter, A, B, th, oh), (A, B)


def _vr_bwd(th, oh, res, g):
    A, B = res
    if pallas_available():
        d_inter = _pallas_vert(_vert_bwd_kernel, g, A, B,
                               out_rows=oh, loop_rows=th)
    else:
        d_inter = _vert_jnp_adjoint(g, A, B, oh)
    return (d_inter, jnp.zeros_like(A), jnp.zeros_like(B))


def _vert_jnp_adjoint(g, A, B, oh: int):
    """Exact adjoint of _vert_jnp w.r.t. inter (jax's transpose of
    take_along_axis is a scatter-add; fine on CPU where this runs)."""
    Bn, C, th, TW = g.shape
    dummy = jnp.zeros((Bn, C, oh, TW), g.dtype)
    _, vjp = jax.vjp(lambda i: _vert_jnp(i, A, B, th), dummy)
    return vjp(g)[0]


_vertical_resample.defvjp(_vr_fwd, _vr_bwd)
