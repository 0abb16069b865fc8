"""Pallas TPU kernel for the packed stem max pool (f=4 -> f=2).

wpack4_maxpool3x3s2 (ops/wpack_encoder.py) is the 3x3/s2 max pool
consuming the 4x8-s2d stem's f=4 width-packed activation
(B, H, M, 4C) and emitting the f=2 packed pooled tensor
(B, H/2, M, 2C).  Its jnp slice-max-chain formulation is exact but
HBM-bound: XLA materialises the row-max intermediate and every
maximum's backward runs compare/select loop fusions over full
tensors — together the single largest non-conv bucket of the bench
step (~35 ms of ~271, scripts/trace_summary.py, round 4).

This module reimplements it as two Pallas kernels that keep the whole
chain VMEM-resident:

  forward   one HBM read of x, one write of y          (vs ~4 passes)
  backward  one read of x and g, one write of gx       (vs ~10 passes)

The backward recomputes the row/width maxima in VMEM (nothing but x
is saved by the custom VJP) and routes the cotangent with equality
masks.  Tie semantics: every input bit-equal to its window max
receives the full cotangent — on a bit-equal tie the mass is
duplicated, unlike jnp.maximum's half/half split or
SelectAndScatter's single winner.  Stem activations are conv outputs
(no relu co-zeros), so ties are measure-zero in training; values are
bit-exact with the jnp chain either way.

Reference: the pool being replaced is monodepth2's
networks/resnet_encoder.py stem `self.encoder.maxpool` (torch
MaxPool2d(3, 2, 1)); layout contract in ops/wpack_encoder.py:256.
Non-TPU backends keep the jnp chain (dispatch.pallas_available).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .dispatch import pallas_available

# output-row tile; Ho must divide by it for the pallas path
_TR = 8
_NEG = float("-inf")


def _split_lanes(r, C):
    return (r[..., 0:C], r[..., C:2 * C],
            r[..., 2 * C:3 * C], r[..., 3 * C:4 * C])


def _width_pool(r, C):
    """(T, M, 4C) row-max -> (T, M, 2C) pooled [d0|d1] lanes."""
    q0, q1, q2, q3 = _split_lanes(r, C)
    q3s = jnp.concatenate(
        [jnp.full_like(q3[:, :1], _NEG), q3[:, :-1]], axis=1)
    d0 = jnp.maximum(jnp.maximum(q3s, q0), q1)
    d1 = jnp.maximum(jnp.maximum(q1, q2), q3)
    return jnp.concatenate([d0, d1], axis=-1)


def _fwd_kernel(xc_ref, xp_ref, out_ref, *, C: int):
    """One (1, TR, 2, M, 4C) block -> (1, TR, M, 2C) pooled rows."""
    i = pl.program_id(1)
    a = xc_ref[0, :, 0]        # stem rows 2o       (TR, M, 4C)
    b = xc_ref[0, :, 1]        # stem rows 2o+1
    # stem row 2o-1 for the first o of the block = last b-row of the
    # previous block; -inf (the pool's pad row) when this is block 0
    prev = xp_ref[0, xc_ref.shape[1] - 1, 1]
    prev = jnp.where(i == 0, jnp.full_like(prev, _NEG), prev)
    bprev = jnp.concatenate([prev[None], b[:-1]], axis=0)
    r = jnp.maximum(jnp.maximum(bprev, a), b)
    out_ref[0] = _width_pool(r, C).astype(out_ref.dtype)


def _bwd_kernel(xc_ref, xp_ref, xn_ref, gc_ref, gn_ref, gx_ref, *,
                C: int):
    """Equality-routed cotangent for one row block.

    Recomputes the row maxima r (and the pooled d0/d1) in VMEM, then
    routes g through the width stage (gr) and the row stage (gx).
    b-phase rows additionally receive the o+1 window's bprev term,
    whose last-row instance needs row 0 of the NEXT block (xn/gn).
    """
    TR = xc_ref.shape[1]
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    f32 = jnp.float32

    a = xc_ref[0, :, 0].astype(f32)
    b = xc_ref[0, :, 1].astype(f32)
    prev = xp_ref[0, TR - 1, 1].astype(f32)
    prev = jnp.where(i == 0, jnp.full_like(prev, _NEG), prev)
    bprev = jnp.concatenate([prev[None], b[:-1]], axis=0)
    r = jnp.maximum(jnp.maximum(bprev, a), b)        # (TR, M, 4C)

    # r/g for the extension row TR (= row 0 of block i+1); zero g and
    # -inf r when this is the last block (no window o+1 exists)
    last = i == nb - 1
    a_n = xn_ref[0, 0, 0].astype(f32)
    b_n = xn_ref[0, 0, 1].astype(f32)
    r_n = jnp.maximum(jnp.maximum(b[TR - 1], a_n), b_n)
    r_n = jnp.where(last, jnp.full_like(r_n, _NEG), r_n)
    g_n = jnp.where(last, jnp.zeros_like(gn_ref[0, 0]),
                    gn_ref[0, 0]).astype(f32)

    r_ext = jnp.concatenate([r, r_n[None]], axis=0)  # (TR+1, M, 4C)
    g_ext = jnp.concatenate(
        [gc_ref[0].astype(f32), g_n[None]], axis=0)  # (TR+1, M, 2C)

    # width stage: gr[o, m, q] from g/d at (o, m) and q3's d0[m+1]
    # tap.  All column shifts happen on the FULL-lane r_ext/g_ext
    # (Mosaic rejects concatenating lane-offset slices), masked at the
    # wrapped edge; the shifted d0 needs no shift of d0 itself:
    # d0[m+1] = max(q3s[m+1], q0[m+1], q1[m+1]) and q3s[m+1] = q3[m].
    M = r_ext.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, M, 1), 1)
    r_prevcol = jnp.where(col == 0, _NEG,
                          jnp.roll(r_ext, 1, axis=1))
    r_nextcol = jnp.where(col == M - 1, _NEG,
                          jnp.roll(r_ext, -1, axis=1))
    g_nextcol = jnp.where(col == M - 1, 0.0,
                          jnp.roll(g_ext, -1, axis=1))
    q0, q1, q2, q3 = _split_lanes(r_ext, C)
    q3s = r_prevcol[..., 3 * C:4 * C]
    d0 = jnp.maximum(jnp.maximum(q3s, q0), q1)
    d1 = jnp.maximum(jnp.maximum(q1, q2), q3)
    g0, g1 = g_ext[..., 0:C], g_ext[..., C:2 * C]
    d0s = jnp.maximum(jnp.maximum(q3, r_nextcol[..., 0:C]),
                      r_nextcol[..., C:2 * C])
    g0s = g_nextcol[..., 0:C]
    gr = jnp.concatenate([
        jnp.where(q0 == d0, g0, 0.0),
        jnp.where(q1 == d0, g0, 0.0) + jnp.where(q1 == d1, g1, 0.0),
        jnp.where(q2 == d1, g1, 0.0),
        jnp.where(q3 == d1, g1, 0.0) + jnp.where(q3 == d0s, g0s, 0.0),
    ], axis=-1)                                      # (TR+1, M, 4C)

    # row stage: a-phase row 2o is tapped by window o only; b-phase
    # row 2o+1 by windows o (as b) and o+1 (as bprev)
    gx_a = jnp.where(a == r, gr[:TR], 0.0)
    gx_b = (jnp.where(b == r, gr[:TR], 0.0)
            + jnp.where(b == r_ext[1:], gr[1:], 0.0))
    gx_ref[0, :, 0] = gx_a.astype(gx_ref.dtype)
    gx_ref[0, :, 1] = gx_b.astype(gx_ref.dtype)


def _pool4_fwd_pallas(xr: jnp.ndarray, C: int) -> jnp.ndarray:
    B, Ho, _, M, FC = xr.shape
    blk = (1, _TR, 2, M, FC)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, C=C),
        grid=(B, Ho // _TR),
        in_specs=[
            pl.BlockSpec(blk, lambda b, i: (b, i, 0, 0, 0)),
            pl.BlockSpec(blk, lambda b, i: (b, jnp.maximum(i - 1, 0),
                                            0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TR, M, 2 * C),
                               lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Ho, M, 2 * C), xr.dtype),
    )(xr, xr)


def _pool4_bwd_pallas(xr: jnp.ndarray, g: jnp.ndarray,
                      C: int) -> jnp.ndarray:
    B, Ho, _, M, FC = xr.shape
    nb = Ho // _TR
    xblk = (1, _TR, 2, M, FC)
    gblk = (1, _TR, M, 2 * C)

    def nxt(i):
        return jnp.minimum(i + 1, nb - 1)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, C=C),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec(xblk, lambda b, i: (b, i, 0, 0, 0)),
            pl.BlockSpec(xblk, lambda b, i: (b, jnp.maximum(i - 1, 0),
                                             0, 0, 0)),
            pl.BlockSpec(xblk, lambda b, i: (b, nxt(i), 0, 0, 0)),
            pl.BlockSpec(gblk, lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(gblk, lambda b, i: (b, nxt(i), 0, 0)),
        ],
        out_specs=pl.BlockSpec(xblk, lambda b, i: (b, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xr.shape, xr.dtype),
    )(xr, xr, xr, g, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool4_pallas(xp4: jnp.ndarray, C: int) -> jnp.ndarray:
    B, H, M, FC = xp4.shape
    xr = xp4.reshape(B, H // 2, 2, M, FC)
    return _pool4_fwd_pallas(xr, C)


def _pool4_vjp_fwd(xp4, C):
    return _pool4_pallas(xp4, C), xp4


def _pool4_vjp_bwd(C, xp4, g):
    B, H, M, FC = xp4.shape
    xr = xp4.reshape(B, H // 2, 2, M, FC)
    gx = _pool4_bwd_pallas(xr, g, C)
    return (gx.reshape(B, H, M, FC),)


_pool4_pallas.defvjp(_pool4_vjp_fwd, _pool4_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool4_hybrid(xp4: jnp.ndarray, C: int) -> jnp.ndarray:
    """jnp-chain forward + pallas backward.

    Measured on-chip (scripts/bench_pool4.py): XLA fuses the forward
    slice-max chain into its producers/consumers nearly for free,
    while its backward materialises compare/select passes over full
    tensors; the pallas forward pays real kernel-launch HBM traffic.
    So the fastest split is: primal = the exact jnp chain (fuses),
    cotangent = the VMEM-resident pallas backward.
    """
    from .wpack_encoder import wpack4_maxpool3x3s2
    return wpack4_maxpool3x3s2(xp4, C)


def _hybrid_vjp_fwd(xp4, C):
    return _pool4_hybrid(xp4, C), xp4


_pool4_hybrid.defvjp(_hybrid_vjp_fwd, _pool4_vjp_bwd)


def wpack4_maxpool3x3s2_hybrid(xp4: jnp.ndarray,
                               C: int = 64) -> jnp.ndarray:
    """jnp-forward / pallas-backward pool (see _pool4_hybrid)."""
    assert pool4_supported(xp4.shape, C), (xp4.shape, C)
    return _pool4_hybrid(xp4, C)


def pool4_supported(shape, C: int = 64) -> bool:
    B, H, M, FC = shape
    return (FC == 4 * C and H % 2 == 0 and (H // 2) % _TR == 0
            and M % 8 == 0)


def wpack4_maxpool3x3s2_pallas(xp4: jnp.ndarray,
                               C: int = 64) -> jnp.ndarray:
    """Drop-in for wpack4_maxpool3x3s2 on TPU-supported shapes."""
    assert pool4_supported(xp4.shape, C), (xp4.shape, C)
    return _pool4_pallas(xp4, C)


def maybe_pallas_pool4(xp4: jnp.ndarray, C: int = 64):
    """The dispatched pool: jnp-forward/pallas-backward on TPU when
    the shape qualifies, else the exact jnp slice-max chain."""
    from .wpack_encoder import wpack4_maxpool3x3s2
    if pallas_available() and pool4_supported(xp4.shape, C):
        return wpack4_maxpool3x3s2_hybrid(xp4, C)
    return wpack4_maxpool3x3s2(xp4, C)
