"""Width-packed ResNet encoder stages — exact MXU-lane fixes for the
stem and layer1, the encoder's two padded-lane FLOP sinks.

The reference encoder (resnet_encoder.py:87-98) spends most of its
executed TPU FLOPs in two places that pad badly onto the 128-lane MXU:

  * the 7x7/stride-2 stem: Cin=3 -> 12 with the 2x2 space-to-depth
    rewrite (ops/fused_upconv.py), still 12/128 input lanes = ~10x
    padded-lane waste;
  * layer1's four 64-channel 3x3 convs: 64/128 lanes on both sides =
    4x waste.

This module applies the width-packing idea of ops/wpack_decoder.py to
both:

  * `s2d4_stem_conv`: the stem as TWO (3,3,48,128) convs over the 4x4
    space-to-depth blocking of the input — one conv per OUTPUT ROW
    phase, each producing both output COLUMN phases as lanes, i.e. the
    stem output arrives natively WIDTH-PACKED at f=2 (lane = q*64 + c).
    Executed FLOPs per output pixel drop ~3.6x vs the 2x2-s2d stem
    (2*9*128*128 per 4 outputs vs 16*128*128 per output).
  * `wpack_maxpool3x3s2`: the 3x3/stride-2 max pool consuming the
    packed f=2 stem feature directly — the width window never crosses
    more than one block boundary, so it is three lane-slices and one
    block shift; rows use a standard reduce_window. Emits the standard
    unpacked layout for layer1.
  * `wpack_conv3x3_zero`: zero-SAME 3x3 conv on width-packed tensors
    (the packed kernel33 with the conv's own zero padding supplying the
    all-zero pad blocks — layer1's convs are zero-padded, so no
    reflect machinery is needed).
  * `PackedBatchNorm` (models/resnet.py) combines per-lane batch
    moments across the f phases — exact in both train and eval modes
    because every phase sees the same element count.

All rewrites are exact to float associativity and share the parameter
tree with the naive modules (tests/test_wpack_encoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .wpack_decoder import wpack_conv3x3_kernel33


def pack_stem_kernel4(kernel: jnp.ndarray):
    """(7,7,Cin,64) stride-2 stem kernel -> two (3,3,16*Cin,128)
    kernels over the 4x4 space-to-depth blocking, one per output row
    phase a; output lanes are (column phase, channel)-major so the
    conv output IS wpack(stem_out, 2).

    Output row r=2j+a (stride-2 grid H/2) taps full-res rows
    4j+2a-3+t (t=0..6) = blocked rows j+(u-1) at block-row phase p
    with t = 4(u-1)+p-2a+3; analogously for columns with phase b.
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    zero = jnp.zeros((cin, cout), kernel.dtype)

    def tap(u, p, a):
        # full-res offset of blocked row (u-1), phase p for output
        # phase a: row index 4j+4(u-1)+p vs taps 4j+2a-3..4j+2a+3
        t = 4 * (u - 1) + p - (2 * a - 3)
        return t if 0 <= t < 7 else None

    kernels = []
    for a in range(2):
        rows = []
        for u in range(3):
            cols = []
            for v in range(3):
                ins = []
                # input lane order matches a reshape-based 4x4
                # space-to-depth: (p, q, c) with c fastest
                for p in range(4):
                    for q in range(4):
                        outs = []
                        for b in range(2):  # output col phase
                            tu = tap(u, p, a)
                            tv = tap(v, q, b)
                            outs.append(kernel[tu, tv]
                                        if tu is not None
                                        and tv is not None else zero)
                        ins.append(jnp.concatenate(outs, axis=1))
                cols.append(jnp.concatenate(ins, axis=0))
            rows.append(jnp.stack(cols, 0))
        kernels.append(jnp.stack(rows, 0))  # (3,3,16*Cin,2*cout)
    return kernels[0], kernels[1]


def s2d4_stem_conv_phases(x: jnp.ndarray, kernel: jnp.ndarray):
    """The two ROW PHASES of wpack(conv7x7_stride2_pad3(x, kernel), 2)
    — (y0, y1), each (B, H/4, W/4, 128), holding stem rows 2j and
    2j+1. Keeping the phases separate lets bn/relu fuse into the convs
    and the 3x3/s2 max pool consume them directly; only the skip
    feature pays the row interleave (interleave_rows)."""
    B, H, W, C = x.shape
    if H % 4 or W % 4:
        raise ValueError("s2d4 stem needs H, W divisible by 4")
    xb = x.reshape(B, H // 4, 4, W // 4, 4, C)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4,
                                                16 * C)
    ka0, ka1 = pack_stem_kernel4(kernel)
    ka0 = ka0.astype(x.dtype)
    ka1 = ka1.astype(x.dtype)

    def conv(rhs):
        return jax.lax.conv_general_dilated(
            xb, rhs, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    return conv(ka0), conv(ka1)


def interleave_rows(y0: jnp.ndarray, y1: jnp.ndarray) -> jnp.ndarray:
    """(B, Hb, W, C) row phases -> (B, 2*Hb, W, C) interleaved."""
    B, Hb, Wb, FC = y0.shape
    return jnp.stack([y0, y1], axis=2).reshape(B, 2 * Hb, Wb, FC)


def s2d4_stem_conv_dilated(x: jnp.ndarray, kernel: jnp.ndarray):
    """== interleave_rows(*s2d4_stem_conv_phases(x, kernel)) as ONE
    lhs-dilated conv — the stem emits wpack(conv7x7_s2(x), 2) with the
    rows already interleaved, so the skip feature's row interleave
    (3 HBM relayout passes in the step trace) disappears.

    With zero-row-dilated input Xz[2j] = xb[j], out[o] =
    sum_s K7[s] Xz[o+s-3] reproduces exactly
      out[2i]   = sum_r ka0[r] xb[i-1+r]   (row phase 0)
      out[2i+1] = sum_r ka1[r] xb[i-1+r]   (row phase 1)
    via K7 = [ka1[0], ka0[0], ka1[1], ka0[1], ka1[2], ka0[2], 0]
    (even/odd taps of the dilated input alternate phases); row padding
    (3, 4) lands out rows 0..2Hb-1 with the same zero-pad semantics as
    the phase convs' padding (1, 1). The transposed-conv lowering is
    the one XLA phase-decomposes for stride-2 conv backwards
    (measured on the up2conv analogue, scripts/bench_interleave.py).
    """
    B, H, W, C = x.shape
    if H % 4 or W % 4:
        raise ValueError("s2d4 stem needs H, W divisible by 4")
    xb = x.reshape(B, H // 4, 4, W // 4, 4, C)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4,
                                                16 * C)
    ka0, ka1 = pack_stem_kernel4(kernel)
    ka0 = ka0.astype(x.dtype)
    ka1 = ka1.astype(x.dtype)
    z = jnp.zeros_like(ka0[0:1])
    K7 = jnp.concatenate([ka1[0:1], ka0[0:1], ka1[1:2], ka0[1:2],
                          ka1[2:3], ka0[2:3], z], axis=0)
    return jax.lax.conv_general_dilated(
        xb, K7, window_strides=(1, 1), padding=((3, 4), (1, 1)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pack_stem_kernel8(kernel: jnp.ndarray, normalize: bool = True):
    """(7,7,3,64) stride-2 stem kernel -> two (3,2,128,256) kernels
    over a LEFT-SHIFTED 4x8 space-to-depth blocking, one per output
    row phase a; output lanes are (column phase b, channel)-major so
    the conv output IS wpack(stem_out, 4).

    Column taps: shifting the blocking grid 3 columns left (the pad-3
    zeros become part of block 0) makes every output's 7-tap column
    window [8m+2b, 8m+2b+6] span exactly TWO blocks (m, m+1) — with
    an unshifted grid the [-3, +3] window straddles three. Output col
    4m+b taps shifted col 8(m+v)+q at kernel tap s = 8v+q-2b.

    normalize=True additionally absorbs the ResNet input
    normalization (x-0.45)/0.225 into a fourth ONES input channel:
    K'[..,c,:] = K/0.225 (c<3), K'[..,3,:] = -(0.45/0.225)*sum_c K.
    conv_pad0([x, 1], K') == conv_pad0((x-0.45)/0.225, K) EXACTLY,
    including the zero-padding border effects (both formulations pad
    every input channel with zeros). Input lanes are then (p, q, c)
    with c in 0..3 fastest: 4*8*4 = 128 lanes, NO MXU pad — vs the
    4x4 blocking's 48/128 (2.67x padded-lane waste, the stem's
    measured 72 TF/s wall in the step trace).
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    if normalize:
        if cin != 3:
            raise ValueError("normalize fold expects a 3-channel stem")
        kernel = jnp.concatenate(
            [kernel / 0.225,
             -(0.45 / 0.225) * jnp.sum(kernel, axis=2, keepdims=True)],
            axis=2)
        cin += 1
    zero = jnp.zeros((cin, cout), kernel.dtype)

    def row_tap(u, p, a):
        t = 4 * (u - 1) + p - (2 * a - 3)
        return t if 0 <= t < 7 else None

    def col_tap(v, q, b):
        s = 8 * v + q - 2 * b
        return s if 0 <= s < 7 else None

    kernels = []
    for a in range(2):
        rows = []
        for u in range(3):
            cols = []
            for v in range(2):
                ins = []
                for p in range(4):
                    for q in range(8):
                        outs = []
                        for b in range(4):
                            tu = row_tap(u, p, a)
                            tv = col_tap(v, q, b)
                            outs.append(kernel[tu, tv]
                                        if tu is not None
                                        and tv is not None else zero)
                        ins.append(jnp.concatenate(outs, axis=1))
                cols.append(jnp.concatenate(ins, axis=0))
            rows.append(jnp.stack(cols, 0))
        kernels.append(jnp.stack(rows, 0))  # (3,2,32*cin,4*cout)
    return kernels[0], kernels[1]


def s2d8_stem_conv_dilated(x: jnp.ndarray, kernel: jnp.ndarray,
                           normalize: bool = True) -> jnp.ndarray:
    """== wpack(conv7x7_stride2_pad3(normalize(x), kernel), 4) as ONE
    lhs-dilated conv over the left-shifted 4x8 space-to-depth
    blocking (pack_stem_kernel8): rows use the same dilated-kernel
    interleave as s2d4_stem_conv_dilated; columns are a VALID 2-tap
    window. With normalize=True, `x` is the RAW [0,1] image and the
    (x-0.45)/0.225 normalization is folded into the kernel via the
    ones channel — the full-frame normalize pass (and its backward)
    disappears from the model entirely. H % 4 == 0, W % 8 == 0."""
    B, H, W, C = x.shape
    if H % 4 or W % 8:
        raise ValueError("s2d8 stem needs H % 4 == 0 and W % 8 == 0")
    if normalize:
        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        C += 1
    # shift-3 blocking: 3 zero cols left; right pad to the next block
    # (covers the max tap W+4 for output col W/2-1, phase b=3)
    x = jnp.pad(x, ((0, 0), (0, 0), (3, 5), (0, 0)))
    Wb = W // 8 + 1
    xb = x.reshape(B, H // 4, 4, Wb, 8, C)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, Wb, 32 * C)
    ka0, ka1 = pack_stem_kernel8(kernel, normalize=normalize)
    ka0 = ka0.astype(x.dtype)
    ka1 = ka1.astype(x.dtype)
    z = jnp.zeros_like(ka0[0:1])
    K7 = jnp.concatenate([ka1[0:1], ka0[0:1], ka1[1:2], ka0[1:2],
                          ka1[2:3], ka0[2:3], z], axis=0)
    return jax.lax.conv_general_dilated(
        xb, K7, window_strides=(1, 1), padding=((3, 4), (0, 0)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def wpack4_maxpool3x3s2(xp4: jnp.ndarray, C: int = 64) -> jnp.ndarray:
    """3x3/s2 max pool (pad 1) consuming the f=4-packed stem
    (B, H, M, 4C) and emitting the f=2-packed pooled tensor
    (B, H/2, M, 2C) — the SAME block count, so the pool output IS
    layer1's packed input and no relayout exists anywhere between
    the stem conv and layer1. Rows use the slice-max chain
    (wpack_maxpool3x3s2_rowslice); width: pooled col 2m+d taps stem
    cols 4m+2d-1..4m+2d+1 = lane slices q3(m-1)|q0|q1 (d=0) and
    q1|q2|q3 (d=1). Values identical to nn.max_pool of the unpacked
    tensor (max commutes)."""
    B, H, M, FC = xp4.shape
    assert FC == 4 * C and H % 2 == 0, (xp4.shape, C)
    x2 = xp4.reshape(B, H // 2, 2, M, FC)
    a, b = x2[:, :, 0], x2[:, :, 1]
    bprev = jnp.pad(b, ((0, 0), (1, 0), (0, 0), (0, 0)),
                    constant_values=-jnp.inf)[:, :H // 2]
    r = jnp.maximum(jnp.maximum(bprev, a), b)  # (B, H/2, M, 4C)
    q0, q1 = r[..., :C], r[..., C:2 * C]
    q2, q3 = r[..., 2 * C:3 * C], r[..., 3 * C:]
    q3s = jnp.pad(q3, ((0, 0), (0, 0), (1, 0), (0, 0)),
                  constant_values=-jnp.inf)[:, :, :M]
    d0 = jnp.maximum(jnp.maximum(q3s, q0), q1)
    d1 = jnp.maximum(jnp.maximum(q1, q2), q3)
    return jnp.concatenate([d0, d1], axis=-1)


def s2d4_stem_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """== wpack(conv7x7_stride2_pad3(x, kernel), 2): the ResNet stem
    over 4x4 space-to-depth blocked input, output width-packed at f=2.
    H, W must be divisible by 4."""
    return interleave_rows(*s2d4_stem_conv_phases(x, kernel))


def phases_maxpool3x3s2(y0: jnp.ndarray, y1: jnp.ndarray,
                        C: int = 64) -> jnp.ndarray:
    """3x3/s2 max pool (pad 1) straight from the width-packed stem ROW
    PHASES — no interleave, no reduce_window. Pool output row o covers
    stem rows 2o-1, 2o, 2o+1 = y1[o-1], y0[o], y1[o] (a row chain
    exactly mirroring the width chain); then the width taps are the
    usual two lane slices + one block shift. Values identical to
    nn.max_pool of the interleaved unpacked tensor (max commutes).
    Emits the unpacked (B, Hb, M, C) layout."""
    FC = y0.shape[-1]
    assert FC == 2 * C, (FC, C)
    Hb = y0.shape[1]
    y1s = jnp.pad(y1, ((0, 0), (1, 0), (0, 0), (0, 0)),
                  constant_values=-jnp.inf)[:, :Hb]
    r = jnp.maximum(jnp.maximum(y1s, y0), y1)  # (B, Hb, M, 2C)
    p0, p1 = r[..., :C], r[..., C:]
    M = r.shape[2]
    p1s = jnp.pad(p1, ((0, 0), (0, 0), (1, 0), (0, 0)),
                  constant_values=-jnp.inf)[:, :, :M]
    return jnp.maximum(jnp.maximum(p0, p1), p1s)


def wpack_maxpool3x3s2(xp: jnp.ndarray, C: int = 64) -> jnp.ndarray:
    """3x3/stride-2 max pool (pad 1) of the UNPACKED tensor, computed
    from its f=2 width-packed form; emits the unpacked layout.

    Width: output col o taps cols 2o-1, 2o, 2o+1 = (block o-1 phase 1),
    (block o phase 0), (block o phase 1) — two lane slices and one
    1-block shift. Rows: standard 3/stride-2 reduce_window.
    """
    B, H, M, FC = xp.shape
    assert FC == 2 * C, (FC, C)
    p0, p1 = xp[..., :C], xp[..., C:]
    p1s = jnp.pad(p1, ((0, 0), (0, 0), (1, 0), (0, 0)),
                  constant_values=-jnp.inf)[:, :, :M]
    w = jnp.maximum(jnp.maximum(p0, p1), p1s)  # (B, H, M, C)
    return jax.lax.reduce_window(
        w, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        ((0, 0), (1, 1), (0, 0), (0, 0)))


def wpack_maxpool3x3s2_rowfirst(xp: jnp.ndarray,
                                C: int = 64) -> jnp.ndarray:
    """wpack_maxpool3x3s2 with the reductions commuted: rows first on
    the PACKED tensor (the reduce_window and its SelectAndScatter
    backward run lane-full at 2C=128), then the width max-chain on the
    row-pooled half-height tensor (half the elements of the
    width-first order). max commutes, so values are identical to
    nn.max_pool of the unpacked tensor; only backward tie-routing
    differs (equal-valued window entries — an equivalent
    subgradient). Emits the unpacked (B, H/2, M, C) layout."""
    B, H, M, FC = xp.shape
    assert FC == 2 * C, (FC, C)
    r = jax.lax.reduce_window(
        xp, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        ((0, 0), (1, 1), (0, 0), (0, 0)))  # (B, H/2, M, 2C)
    p0, p1 = r[..., :C], r[..., C:]
    p1s = jnp.pad(p1, ((0, 0), (0, 0), (1, 0), (0, 0)),
                  constant_values=-jnp.inf)[:, :, :M]
    return jnp.maximum(jnp.maximum(p0, p1), p1s)


def _wpool_width(xp: jnp.ndarray, C: int):
    """Width part of the packed 3x3/s2 pool: pooled col o =
    max(p1[o-1], p0[o], p1[o]) with p1[-1] = -inf."""
    p0, p1 = xp[..., :C], xp[..., C:]
    M = xp.shape[2]
    p1s = jnp.pad(p1, ((0, 0), (0, 0), (1, 0), (0, 0)),
                  constant_values=-jnp.inf)[:, :, :M]
    return p0, p1, p1s, jnp.maximum(jnp.maximum(p0, p1), p1s)


def _rowpool(w: jnp.ndarray):
    return jax.lax.reduce_window(
        w, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        ((0, 0), (1, 1), (0, 0), (0, 0)))


def wpack_maxpool3x3s2_rowslice(xp: jnp.ndarray,
                                C: int = 64) -> jnp.ndarray:
    """wpack_maxpool3x3s2 with the ROW reduction as a strided
    slice-max chain instead of reduce_window: pooled row o =
    max(x[2o-1], x[2o], x[2o+1]) via an even/odd row split (a free
    bitcast on the major H axis) + one shifted pad, mirroring the
    width chain. The whole pool then lowers to elementwise maxima
    whose autodiff is compare/select loop fusions in the surrounding
    {C,B}-minor layout — no SelectAndScatter in the backward and no
    H-minor relayout of the stem activation around reduce_window
    (two ~3 ms layout copies per model pass in the step trace,
    scripts/trace_summary.py). Values identical to nn.max_pool of
    the unpacked tensor (max commutes); backward tie routing differs
    from SelectAndScatter's single-winner rule only on bit-equal
    window entries (an equivalent subgradient). Emits the unpacked
    (B, H/2, M, C) layout."""
    B, H, M, FC = xp.shape
    assert FC == 2 * C and H % 2 == 0, (xp.shape, C)
    x2 = xp.reshape(B, H // 2, 2, M, FC)
    a, b = x2[:, :, 0], x2[:, :, 1]  # stem rows 2o / 2o+1
    bprev = jnp.pad(b, ((0, 0), (1, 0), (0, 0), (0, 0)),
                    constant_values=-jnp.inf)[:, :H // 2]  # row 2o-1
    r = jnp.maximum(jnp.maximum(bprev, a), b)  # (B, H/2, M, 2C)
    p0, p1 = r[..., :C], r[..., C:]
    p1s = jnp.pad(p1, ((0, 0), (0, 0), (1, 0), (0, 0)),
                  constant_values=-jnp.inf)[:, :, :M]
    return jnp.maximum(jnp.maximum(p0, p1), p1s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def wpack_maxpool3x3s2_fused(xp: jnp.ndarray, C: int = 64):
    """wpack_maxpool3x3s2 with a hand-rolled one-recompute backward.

    XLA's autodiff of the max chain + pad/slice/concat transposes runs
    ~4 full-tensor passes per select plus a SelectAndScatter — the
    single largest elementwise bucket of the PGD step
    (scripts/profile_step.py). The custom backward routes the
    cotangent by equality masks instead: gw[r] = sum over the <=2
    covering output rows of g*(w==y), then gp = gw*(p==w) per width
    tap. Tie semantics (ADVICE r3): EVERY input equal to the window
    max receives the FULL cotangent — bit-equal ties (e.g. co-zero
    relu outputs) DUPLICATE cotangent mass, unlike XLA's
    SelectAndScatter (one winner) or a convex-combination subgradient
    (mass split). Exact on continuous inputs, where ties are
    measure-zero. Unwired in the model (the step keeps autodiff —
    docs/PERFORMANCE.md "Measured dead end"); kept tested.
    """
    _, _, _, w = _wpool_width(xp, C)
    return _rowpool(w)


def _wpool_fwd(xp, C):
    p0, p1, p1s, w = _wpool_width(xp, C)
    y = _rowpool(w)
    return y, (xp, y)


def _wpool_bwd(C, res, g):
    xp, y = res
    B, H, M, _ = xp.shape
    assert H % 2 == 0 and y.shape[1] == H // 2, (H, y.shape)
    p0, p1, p1s, w = _wpool_width(xp, C)

    # row routing: w row r is covered by output rows (r-1)//2 (window
    # top r-1 <= padded) and (r+1)//2; with pad 1 the window at output
    # o covers w rows 2o-1..2o+1. Build gw[r] = sum_o in cover
    # g[o] * (w[r] == y[o]) with two strided comparisons.
    # output row o covers w rows 2o-1, 2o, 2o+1: even w rows r=2m are
    # covered by o=m only; odd rows r=2m+1 by o=m and o=m+1. Strided
    # slices instead of gathers (Ho = H//2 here since H is even).
    w_even = w[:, 0::2]
    w_odd = w[:, 1::2]
    y1 = jnp.concatenate(
        [y[:, 1:], jnp.full_like(y[:, :1], -jnp.inf)], axis=1)
    g1 = jnp.concatenate([g[:, 1:], jnp.zeros_like(g[:, :1])], axis=1)
    gw_even = jnp.where(w_even == y, g, 0)
    gw_odd = (jnp.where(w_odd == y, g, 0)
              + jnp.where(w_odd == y1, g1, 0))
    gw = jnp.stack([gw_even, gw_odd], axis=2).reshape(
        g.shape[0], H, M, w.shape[-1])
    # width routing
    g0 = jnp.where(p0 == w, gw, 0)
    g1 = jnp.where(p1 == w, gw, 0)
    g1s = jnp.where(p1s == w, gw, 0)
    # p1s[o] = p1[o-1] => grad flows back shifted left
    g1 = g1 + jnp.pad(g1s, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
    return (jnp.concatenate([g0, g1], axis=-1).astype(xp.dtype),)


wpack_maxpool3x3s2_fused.defvjp(_wpool_fwd, _wpool_bwd)


def wpack_conv3x3_zero(xp: jnp.ndarray, kernel: jnp.ndarray,
                       f: int = 2) -> jnp.ndarray:
    """wpack(conv3x3_zero_SAME(X, kernel), f) given wpack(X, f): the
    phase-blocked kernel33 with the conv's own zero padding supplying
    the (all-zero) pad blocks and rows."""
    k33 = wpack_conv3x3_kernel33(kernel, f).astype(xp.dtype)
    return jax.lax.conv_general_dilated(
        xp, k33, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
