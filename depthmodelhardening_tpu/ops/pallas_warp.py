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


# Static accumulation-band heights for the banded kernels (rows per
# loop iteration actually touched by the 2-tap kernel, 8-aligned).
# Measured worst cases over a 200x200 grid spanning z0 in [4.5, 31],
# alpha in [-32, 32] (wider than TRAIN/EVAL_DIST_RANGE x ANGLE_RANGE)
# with valid-column masking, 256x256 tiles at 1024x320: fwd 35.2, bwd
# 36.3 rows; +8 alignment slack rounds to 48, +1 block of margin = 56.
# A lax.cond falls back to the dense kernels whenever a geometry's
# measured bands don't fit (attacks hoist that check to trace time via
# EoTCompositor.check_bands_fit), so banding is a pure optimization,
# never a semantics change.
BAND_FWD = 56
BAND_BWD = 56


def _vert_fwd_banded_kernel(a_ref, b_ref, y0_ref, inter_ref, out_ref,
                            acc_ref, *, loop_rows: int, out_rows: int,
                            band: int):
    """Banded fwd: object row k only touches output rows
    [y0[k], y0[k]+band) (y0 8-aligned, precomputed outside)."""
    C = inter_ref.shape[1]
    TW = inter_ref.shape[3]
    A = a_ref[0, 0, :].reshape(1, TW)
    B = b_ref[0, 0, :].reshape(1, TW)
    rows0 = jax.lax.broadcasted_iota(
        jnp.int32, (band, TW), 0).astype(jnp.float32)

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def body(k, _):
        import jax.experimental.pallas as pl

        y0 = pl.multiple_of(y0_ref[0, 0, k], 8)
        # A * (y0 + r) + B: bit-identical to the dense kernel's
        # A * y + B (y0 + r is an exactly-representable int)
        sy = A * (rows0 + y0.astype(jnp.float32)) + B
        w = jnp.maximum(0.0, 1.0 - jnp.abs(sy - k.astype(jnp.float32)))
        for c in range(C):
            row = inter_ref[0, c, k, :].reshape(1, TW).astype(jnp.float32)
            acc_ref[c, pl.dslice(y0, band), :] += w * row
        return 0

    jax.lax.fori_loop(0, loop_rows, body, 0)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _vert_bwd_banded_kernel(a_ref, b_ref, k0_ref, g_ref, out_ref,
                            acc_ref, *, loop_rows: int, out_rows: int,
                            band: int):
    """Banded transpose: tile row y only touches object rows
    [k0[y], k0[y]+band)."""
    C = g_ref.shape[1]
    TW = g_ref.shape[3]
    A = a_ref[0, 0, :].reshape(1, TW)
    B = b_ref[0, 0, :].reshape(1, TW)
    ks0 = jax.lax.broadcasted_iota(
        jnp.int32, (band, TW), 0).astype(jnp.float32)

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def body(y, _):
        import jax.experimental.pallas as pl

        k0 = pl.multiple_of(k0_ref[0, 0, y], 8)
        sy = A * y.astype(jnp.float32) + B  # (1, TW)
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(sy - k0.astype(jnp.float32) - ks0))
        for c in range(C):
            g = g_ref[0, c, y, :].reshape(1, TW).astype(jnp.float32)
            acc_ref[c, pl.dslice(k0, band), :] += w * g
        return 0

    jax.lax.fori_loop(0, loop_rows, body, 0)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _band_starts(lo, hi, out_rows: int, band: int):
    """8-aligned window starts covering [lo, hi) per entry, plus a
    scalar fits flag (False => dense fallback)."""
    lo = jnp.floor(lo)
    # the clamp bound must stay 8-aligned too (the kernels hint
    # pl.multiple_of(start, 8)); align it DOWN — a lowered start only
    # widens coverage and the fits check below uses the final start
    start = jnp.clip((lo // 8) * 8, 0, max((out_rows - band) // 8 * 8, 0))
    fits = jnp.all(jnp.ceil(hi) - start <= band) & (out_rows >= band)
    return start.astype(jnp.int32), fits


# Band extrema are evaluated on probe columns instead of all TW.
# Columns with no pass-1 support (sx outside (-1, obj_w): every
# triangular weight is zero, so inter[..., x] == 0) contribute nothing
# in either direction — forward because the accumulated rows are zero,
# backward because d_inter at those columns is multiplied by the
# all-zero Wx column in the pass-1 adjoint. The bands therefore only
# need to cover the VALID column interval, which is contiguous (sx is
# a Mobius function of x, monotonic while g*X+1 keeps its sign — true
# for physical camera geometry), and on it (k - B(x))/A(x) is exactly
# LINEAR in x while A(x)y + B(x) is Mobius-monotonic: the interval's
# endpoints (plus a midpoint, belt-and-braces) give the exact extrema.
# Contract note: d_inter on support-free columns is window-truncated
# (downstream-invisible); the dense kernels remain the reference.


def _probe(A, B, valid):
    """(B, 3) probe values of A and B: endpoints + midpoint of the
    valid column interval (whole tile when valid is None)."""
    Bn, TW = A.shape
    if valid is None:
        cols = jnp.broadcast_to(
            jnp.asarray([0, TW // 2, TW - 1], jnp.int32), (Bn, 3))
    else:
        idx = jnp.arange(TW, dtype=jnp.int32)
        any_valid = jnp.any(valid, axis=1, keepdims=True)
        xl = jnp.argmax(valid, axis=1).astype(jnp.int32)
        xr = (TW - 1
              - jnp.argmax(valid[:, ::-1], axis=1)).astype(jnp.int32)
        xl = jnp.where(any_valid[:, 0], xl, 0)
        xr = jnp.where(any_valid[:, 0], xr, 0)
        cols = jnp.stack([xl, (xl + xr) // 2, xr], axis=1)
    Ap = jnp.take_along_axis(A, cols, axis=1)
    Bp = jnp.take_along_axis(B, cols, axis=1)
    return Ap, Bp


def _fwd_bands(A, B, out_rows: int, loop_rows: int, valid=None):
    """Output-row window per object row k: y in (k-1-B)/A..(k+1-B)/A
    over the probe columns (exact by linearity in x)."""
    Ap, Bp = _probe(A, B, valid)
    ks = jnp.arange(loop_rows, dtype=jnp.float32)[None, :, None]
    e1 = (ks - 1.0 - Bp[:, None, :]) / Ap[:, None, :]
    e2 = (ks + 1.0 - Bp[:, None, :]) / Ap[:, None, :]
    lo = jnp.clip(jnp.min(jnp.minimum(e1, e2), axis=2), 0, out_rows)
    hi = jnp.clip(jnp.max(jnp.maximum(e1, e2), axis=2), 0, out_rows)
    return _band_starts(lo, hi, out_rows, BAND_FWD)


def _bwd_bands(A, B, out_rows: int, loop_rows: int, valid=None):
    """Object-row window per tile row y: k in A*y+B-1..A*y+B+1
    (exact at the probe columns by Mobius monotonicity in x)."""
    Ap, Bp = _probe(A, B, valid)
    ys = jnp.arange(loop_rows, dtype=jnp.float32)[None, :, None]
    e = Ap[:, None, :] * ys + Bp[:, None, :]
    lo = jnp.clip(jnp.min(e, axis=2) - 1.0, 0, out_rows)
    hi = jnp.clip(jnp.max(e, axis=2) + 1.0, 0, out_rows)
    return _band_starts(lo, hi, out_rows, BAND_BWD)


def _pallas_vert_banded(kernel, inter, A, B, starts, out_rows: int,
                        loop_rows: int, band: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn, C, _, TW = inter.shape
    return pl.pallas_call(
        functools.partial(kernel, loop_rows=loop_rows,
                          out_rows=out_rows, band=band),
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec((1, 1, TW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, loop_rows), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
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
      B.astype(jnp.float32)[:, None, :], starts[:, None, :], inter)


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


def vertical_resample(inter, A, B, th: int, bands_fit=None,
                      valid=None):
    """Per-column vertical 1-D bilinear resample (pass 2 of the
    separable EoT warp).

    inter: (B, C, OH, TW) — pass-1 output, channel-major.
    A, B:  (B, TW) float32 per-column affine row maps; source row for
           output (y, x) is A[x]*y + B[x] (zero fill outside [0, OH)).
    bands_fit: static tri-state for the banded TPU kernels.
      True  — the caller proved (EoTCompositor.check_bands_fit, a
              trace-time sweep of its static geometry ranges) that
              every accumulation band fits BAND_FWD/BAND_BWD: run the
              banded kernels directly.
      False — run the dense kernels.
      None  — decide per batch with a runtime lax.cond (safe default;
              costs the cond's operand copies, ~0.4 ms/call at the
              attack shapes).
    valid: optional (B, TW) bool — columns with pass-1 support; the
      banded kernels' windows only need to cover these (zero-inter
      columns are invisible in both directions, see the band-extrema
      note above).
    Returns (B, C, th, TW) in inter's dtype. Differentiable w.r.t.
    inter (exact mirrored-kernel adjoint); A/B get zero cotangents.
    """
    return _vertical_resample(inter, A, B, valid, th,
                              inter.shape[2], bands_fit)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _vertical_resample(inter, A, B, valid, th: int, oh: int,
                       bands_fit):
    if pallas_available():
        if bands_fit is False:
            return _pallas_vert(_vert_fwd_kernel, inter, A, B,
                                out_rows=th, loop_rows=oh)
        starts, fits = _fwd_bands(A, B, th, oh, valid)
        banded = lambda: _pallas_vert_banded(
            _vert_fwd_banded_kernel, inter, A, B, starts,
            out_rows=th, loop_rows=oh, band=BAND_FWD)
        if bands_fit:
            return banded()
        return jax.lax.cond(
            fits, banded,
            lambda: _pallas_vert(_vert_fwd_kernel, inter, A, B,
                                 out_rows=th, loop_rows=oh))
    return _vert_jnp(inter, A, B, th)


def _vr_fwd(inter, A, B, valid, th, oh, bands_fit):
    return (_vertical_resample(inter, A, B, valid, th, oh, bands_fit),
            (A, B, valid))


def _vr_bwd(th, oh, bands_fit, res, g):
    A, B, valid = res
    if pallas_available():
        if bands_fit is False:
            d_inter = _pallas_vert(_vert_bwd_kernel, g, A, B,
                                   out_rows=oh, loop_rows=th)
        else:
            starts, fits = _bwd_bands(A, B, oh, th, valid)
            banded = lambda: _pallas_vert_banded(
                _vert_bwd_banded_kernel, g, A, B, starts,
                out_rows=oh, loop_rows=th, band=BAND_BWD)
            if bands_fit:
                d_inter = banded()
            else:
                d_inter = jax.lax.cond(
                    fits, banded,
                    lambda: _pallas_vert(_vert_bwd_kernel, g, A, B,
                                         out_rows=oh, loop_rows=th))
    else:
        d_inter = _vert_jnp_adjoint(g, A, B, oh)
    return (d_inter, jnp.zeros_like(A), jnp.zeros_like(B),
            None if valid is None else jnp.zeros_like(valid))


def _vert_jnp_adjoint(g, A, B, oh: int):
    """Exact adjoint of _vert_jnp w.r.t. inter (jax's transpose of
    take_along_axis is a scatter-add; fine on CPU where this runs)."""
    Bn, C, th, TW = g.shape
    dummy = jnp.zeros((Bn, C, oh, TW), g.dtype)
    _, vjp = jax.vjp(lambda i: _vert_jnp(i, A, B, th), dummy)
    return vjp(g)[0]


_vertical_resample.defvjp(_vr_fwd, _vr_bwd)
