"""Channel-major (space-to-depth packed) decoder stages — exact rewrite.

The Monodepth2 decoder's large-spatial stages run at 16/32 channels
(depth_decoder.py:31-47 in the reference), which strand TPU MXU lanes:
measured on v5e, the 16->16 conv3x3 at 320x512 runs at ~2% MFU and two
direct Pallas formulations only reached XLA parity because any layout
with Cout<=32 output channels caps systolic utilization
(scripts/bench_pallas_conv2.py, docs/PERFORMANCE.md).

The fix is a LAYOUT, not a kernel: hold the decoder's /2- and /1-scale
activations in a 2x2 space-to-depth packing ("packed", phase-major
channels: index = (a*2+b)*C + c for spatial phase (a, b)), so every hot
conv sees 4x the channels at 1/4 the positions. A reflect-padded 3x3
conv on the original tensor is EXACTLY a 2x2 conv on the packed tensor
with a phase-blocked kernel assembled from the same (3,3,Cin,Cout)
parameters — identical linear map, float-associativity-level numerics.
Unlike the per-stage fused upconv (ops/fused_upconv.py, measured
slower: it pays a full-resolution 4-phase interleave around every
conv), the packing here is held ACROSS stages: the only layout
converts are one cheap 16-channel unpack inside the /2 -> /1 upsample
and the tiny disparity-head unpacks.

Derivation. With X the original (B,2n,2m,C) tensor and
x[i,j,(p,q),c] = X[2i+p, 2j+q, c] its packing, output row 2i+a of
conv3x3(reflect_pad1(X)) taps original rows 2i+a-1 .. 2i+a+1, which
live in packed block rows (i-1, i) for a=0 and (i, i+1) for a=1 (cols
likewise). Padding x with one REFLECT-ADJUSTED block row/col on each
side (see reflect_pad_packed) and running one VALID 2x2 conv over the
padded tensor therefore yields, at position (i+a, j+b), exactly the
phase-(a,b) outputs — each phase group is a contiguous channel slice
(phase-major), shifted by its own (a, b) offset.

The nearest x2 upsample composes for free: pack2(upsample2(X)) simply
broadcasts X's channels into all four phases (tile4), so the decoder's
upsample -> concat-skip -> conv chain becomes tile4 -> channel concat
with pack2(skip) -> packed conv, with no materialized upsampled tensor.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# (window_offset w, sub-row p) -> 3x3 kernel row index (None = zero tap)
# for output phase a=0 (window covers blocks i-1, i) and a=1 (blocks
# i, i+1); identical tables apply to columns with (b, q).
_TAP = (
    ((None, 0), (1, 2)),  # a=0: (w=0,p=1)->W[0], (w=1,p=0)->W[1], (w=1,p=1)->W[2]
    ((0, 1), (2, None)),  # a=1: (w=0,p=0)->W[0], (w=0,p=1)->W[1], (w=1,p=0)->W[2]
)


def pack2(x: jnp.ndarray) -> jnp.ndarray:
    """(B,2n,2m,C) -> (B,n,m,4C) phase-major space-to-depth packing:
    out[..., (a*2+b)*C + c] = x[2i+a, 2j+b, c]."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError("pack2 needs even H, W")
    xb = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2,
                                                  4 * C)


def unpack2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack2: (B,n,m,4C) -> (B,2n,2m,C)."""
    B, n, m, C4 = x.shape
    C = C4 // 4
    xb = x.reshape(B, n, m, 2, 2, C)
    return xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * n, 2 * m, C)


def tile4(x: jnp.ndarray) -> jnp.ndarray:
    """pack2(nearest_upsample2(x)) without materializing the upsample:
    all four phases of the upsampled tensor equal x, so the packing is
    a channel tile. (B,n,m,C) -> (B,n,m,4C)."""
    return jnp.tile(x, (1, 1, 1, 4))


def pack_conv3x3_kernel(kernel: jnp.ndarray,
                        segment_channels: Optional[Sequence[int]] = None
                        ) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (2,2,4Cin,4Cout) phase-blocked 2x2 kernel.

    Input channels are phase-major per SEGMENT: when the packed input is
    a concat of independently packed tensors (e.g. tile4(up) ++
    pack2(skip)), pass their original channel counts so the in-channel
    blocks follow [seg0 phases x C0][seg1 phases x C1]...; the original
    kernel's in-axis is ordered [C0][C1]... exactly as the unpacked
    concat would be. Output channels are phase-major over the whole
    Cout. Gradients flow through the assembly (pure stack/concat of
    kernel slices), so autodiff yields the exact packed adjoint.
    """
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    if segment_channels is None:
        segment_channels = (Cin,)
    assert sum(segment_channels) == Cin
    zeros = {}

    def w_or_zero(dy, dx, c0, C):
        if dy is None or dx is None:
            if C not in zeros:
                zeros[C] = jnp.zeros((C, Cout), kernel.dtype)
            return zeros[C]
        return kernel[dy, dx, c0:c0 + C]

    rows = []
    for wr in range(2):
        cols = []
        for wc in range(2):
            # in-channel blocks: per segment, phase-major (p, q)
            in_blocks = []
            c0 = 0
            for C in segment_channels:
                for p in range(2):
                    for q in range(2):
                        # out-channel blocks: phase-major (a, b)
                        out_blocks = []
                        for a in range(2):
                            for b in range(2):
                                dy = _TAP[a][wr][p]
                                dx = _TAP[b][wc][q]
                                out_blocks.append(
                                    w_or_zero(dy, dx, c0, C))
                        in_blocks.append(
                            jnp.concatenate(out_blocks, axis=1))
                c0 += C
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)  # (2,2,4Cin,4Cout)


def _reflect_rows(x):
    """The two reflect-adjusted pad BLOCK rows of a packed tensor.

    The top pad block holds original rows (-2, -1) -> reflect ->
    (2, 1): its p=0 half (first 2C channels, phase-major) comes from
    packed row 1's p=0 half, its p=1 half from packed row 0's p=1 half.
    Bottom: original rows (2n, 2n+1) -> reflect -> (2n-2, 2n-3) =
    (row n-1 p=0, row n-2 p=1). Needs n >= 2.
    """
    n, h = x.shape[1], x.shape[-1] // 2
    top = jnp.concatenate([x[:, 1:2, :, :h], x[:, 0:1, :, h:]], axis=-1)
    bot = jnp.concatenate([x[:, n - 1:n, :, :h],
                           x[:, n - 2:n - 1, :, h:]], axis=-1)
    return top, bot


def _reflect_cols(x):
    """The two reflect-adjusted pad block COLUMNS (q is the minor phase
    bit, so the halves interleave per phase group). Needs m >= 2."""
    B, n, m, C4 = x.shape
    C = C4 // 4
    xg = x.reshape(B, n, m, 2, 2, C)
    left = jnp.concatenate([xg[:, :, 1:2, :, 0:1], xg[:, :, 0:1, :, 1:2]],
                           axis=4).reshape(B, n, 1, C4)
    right = jnp.concatenate([xg[:, :, m - 1:m, :, 0:1],
                             xg[:, :, m - 2:m - 1, :, 1:2]],
                            axis=4).reshape(B, n, 1, C4)
    return left, right


def reflect_pad_packed(x: jnp.ndarray) -> jnp.ndarray:
    """Pad a packed tensor by one block on each side such that a VALID
    2x2 conv with the pack_conv3x3_kernel reproduces reflect_pad1 +
    conv3x3 of the original tensor (reflect padding is separable, so
    padding rows then columns of the row-padded tensor handles the
    corners). Exact but copies the full tensor twice — the fast path in
    packed_conv3x3_reflect uses conv-native zero padding with border
    corrections instead; this form remains the reference for tests.
    Needs n, m >= 2.
    """
    top, bot = _reflect_rows(x)
    x = jnp.concatenate([top, x, bot], axis=1)
    left, right = _reflect_cols(x)
    return jnp.concatenate([left, x, right], axis=2)


def packed_conv3x3_reflect(x, kernel: jnp.ndarray,
                           bias: Optional[jnp.ndarray] = None,
                           segment_channels: Optional[Sequence[int]] = None,
                           dtype=None) -> jnp.ndarray:
    """pack2(conv3x3(reflect_pad1(X)) + bias) given pack2(X).

    x: (B,n,m,4Cin) packed input, or a LIST of independently packed
    tensors (e.g. [tile4(up), pack2(skip)]) — each segment is
    reflect-padded in its own phase-major layout and the padded
    segments are concatenated (reflect_pad_packed's phase slicing is
    only valid on a single phase-major tensor). kernel: (3,3,Cin,Cout)
    ORIGINAL parameters (shared with the unpacked path), in-axis
    ordered like the unpacked concat; bias: (Cout,). Returns the packed
    (B,n,m,4Cout) output.
    """
    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    if segment_channels is None:
        segment_channels = tuple(t.shape[-1] // 4 for t in xs)
    dt = dtype or xs[0].dtype
    xs = [t.astype(dt) for t in xs]
    xcat = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
    B, n, m, _ = xcat.shape
    cout = kernel.shape[-1]
    kp = pack_conv3x3_kernel(kernel, segment_channels).astype(dt)

    def conv(lhs, rhs, padding):
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # main conv with ZERO padding — the pad concats of
    # reflect_pad_packed cost more than the conv itself on TPU
    # (scripts/bench_packed_parts.py); the dropped reflect-pad
    # contributions touch only the first/last output row/column and
    # are restored by four 1-row/1-col mini-convs below.
    y = conv(xcat, kp, ((1, 1), (1, 1)))  # (B,n+1,m+1,4Cout)

    # reflect-adjusted pad blocks, built per segment (the phase slicing
    # is only valid within one phase-major tensor)
    tb = [_reflect_rows(t) for t in xs]
    lr = [_reflect_cols(t) for t in xs]
    cat = (lambda ts: ts[0] if len(ts) == 1
           else jnp.concatenate(ts, axis=-1))
    top, bot = cat([t for t, _ in tb]), cat([b for _, b in tb])
    left, right = cat([l for l, _ in lr]), cat([r for _, r in lr])
    # corner blocks via separability (column-reflect of the pad rows);
    # per segment again
    ctl, ctr = zip(*[_reflect_cols(t) for t, _ in tb])
    cbl, cbr = zip(*[_reflect_cols(b) for _, b in tb])
    ctl, ctr, cbl, cbr = cat(list(ctl)), cat(list(ctr)), \
        cat(list(cbl)), cat(list(cbr))

    # row corrections carry their corner contributions (1x2 VALID conv
    # over the corner-extended pad row); column corrections are
    # zero-extended so every pad contribution is counted exactly once
    corr_t = conv(jnp.concatenate([ctl, top, ctr], axis=2),
                  kp[0:1], "VALID")            # (B,1,m+1,4Cout)
    corr_b = conv(jnp.concatenate([cbl, bot, cbr], axis=2),
                  kp[1:2], "VALID")
    corr_l = conv(left, kp[:, 0:1], ((1, 1), (0, 0)))  # (B,n+1,1,4Cout)
    corr_r = conv(right, kp[:, 1:2], ((1, 1), (0, 0)))
    y = y.at[:, :1].add(corr_t)
    y = y.at[:, -1:].add(corr_b)
    y = y.at[:, :, :1].add(corr_l)
    y = y.at[:, :, -1:].add(corr_r)

    # phase (a,b) lives in channel block g=a*2+b, read at offset (a,b)
    parts = [y[:, a:a + n, b:b + m,
               (a * 2 + b) * cout:(a * 2 + b + 1) * cout]
             for a in range(2) for b in range(2)]
    out = jnp.concatenate(parts, axis=-1)
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(out.dtype)
    return out
