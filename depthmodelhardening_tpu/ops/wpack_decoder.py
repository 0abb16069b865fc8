"""Width-packed decoder convs — exact, transpose-free channel widening.

The decoder's 16/32-channel convs run at the PADDED-lane MXU roofline
on TPU: a (B,H,W,16) NHWC conv pads both channel dims 16 -> 128, an
8x8 = 64x FLOP waste that XLA executes at ~83% of the padded peak
(scripts/bench_packed_parts.py) — the conv is "efficient" at doing 64x
nothing. The 2x2 space-to-depth packing (ops/packed_decoder.py) fixes
the lanes but pays lane<->sublane transposes (pack2 ~2.4 ms per 335 MB
tensor) that eat the win end-to-end; batch-folded grouped convs lower
~7x SLOWER (scripts/bench_group_conv.py).

This module packs along WIDTH ONLY: (B, H, W, C) -> (B, H, W/f, f*C)
is a PURE CONTIGUOUS RESHAPE (W and C are adjacent in row-major NHWC),
so entering/leaving the layout costs nothing. A reflect-padded 3x3
conv on the original tensor is EXACTLY a 3x2 conv on the width-packed
tensor with a phase-blocked kernel built from the same (3,3,Cin,Cout)
parameters:

  output phase b (orig col f*j+b) taps orig cols f*j+b-1 .. f*j+b+1,
  which live in packed blocks (j-1, j) for b=0 and (j, j+1) for
  b=f-1 (interior phases touch only block j). One conv with zero col
  padding (1,1) produces W/f+1 positions; phase groups b<f-1 read
  positions 0..M-1 and group f-1 reads 1..M (two contiguous channel-
  block slices). Rows are NOT packed, so the row dimension keeps plain
  3-tap structure, and the reflect pad is built directly in packed
  space: reflected rows verbatim, plus one pad block per side whose
  single tapped phase slot carries the reflected column — a single
  padded copy + VALID conv, no correction passes.

f=8 with C=16 gives 128 exact input lanes (dense-kernel FLOP overhead
3*2*f/(9) = 2/3*f; the 4-8x lane win dominates at C<=32).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def wpack(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W/f,f*C); channel index = q*C + c for width
    phase q. A contiguous reshape — no data movement."""
    B, H, W, C = x.shape
    if W % f:
        raise ValueError(f"W={W} not divisible by f={f}")
    return x.reshape(B, H, W // f, f * C)


def wunpack(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of wpack."""
    B, H, M, FC = x.shape
    return x.reshape(B, H, M * f, FC // f)


def wlane_up2(x: jnp.ndarray, f: int, C: int) -> jnp.ndarray:
    """Exact 2x nearest upsample entirely inside the packed layout:
    (B,H,M,f*C) at width W=f*M -> (B,2H,M,2f*C) = the upsampled image
    packed at 2f over width 2W (same block count M).

    Width: output phase q' of a block reads input phase q'//2 — a
    per-block lane duplication that never crosses block boundaries
    (out vreg lanes come from one source vreg). Height: row
    interleave on the outer dimension (contiguous row copies). Neither
    touches the (W, C) sublane/lane retiling that makes the unpack ->
    jnp.repeat -> repack chain cost ~16 ms/pass of HBM relayouts in
    the full decoder (hlo_stats trace, docs/PERFORMANCE.md).
    Parity: tests/test_packed_decoder.py::test_wlane_up2_exact."""
    B, H, M, FC = x.shape
    y = x.reshape(B, H, M, f, 1, C)
    y = jnp.broadcast_to(y, (B, H, M, f, 2, C)).reshape(B, H, M, 2 * FC)
    y = jnp.broadcast_to(y[:, :, None], (B, H, 2, M, 2 * FC))
    return y.reshape(B, 2 * H, M, 2 * FC)


def wpack_conv3x3_kernel(kernel: jnp.ndarray, f: int,
                         segment_channels: Optional[Sequence[int]] = None
                         ) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (3,2,f*Cin,f*Cout) width-phase-blocked kernel.

    Input channels are phase-major per SEGMENT (q*C_seg + c), matching
    wpack of each concatenated tensor; output channels phase-major over
    the whole Cout. Window convention: phase b reads conv position j
    for b < f-1 (window = packed blocks (j-1, j)) and position j+1 for
    b = f-1 (window = (j, j+1)).
    """
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    if segment_channels is None:
        segment_channels = (Cin,)
    assert sum(segment_channels) == Cin

    # (b, wc, q) -> dx tap index or None
    def tap(b, wc, q):
        if b < f - 1:
            # window blocks (j-1, j): wc=0 -> block j-1, wc=1 -> block j
            rel = (wc - 1) * f + q  # orig col offset from f*j
        else:
            # window blocks (j, j+1)
            rel = wc * f + q
        dx = rel - (b - 1)
        return dx if 0 <= dx <= 2 else None

    zeros = {}

    def w_or_zero(wr, dx, c0, C):
        if dx is None:
            if C not in zeros:
                zeros[C] = jnp.zeros((C, Cout), kernel.dtype)
            return zeros[C]
        return kernel[wr, dx, c0:c0 + C]

    rows = []
    for wr in range(3):
        cols = []
        for wc in range(2):
            in_blocks = []
            c0 = 0
            for C in segment_channels:
                for q in range(f):
                    out_blocks = [w_or_zero(wr, tap(b, wc, q), c0, C)
                                  for b in range(f)]
                    in_blocks.append(
                        jnp.concatenate(out_blocks, axis=1))
                c0 += C
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)  # (3,2,f*Cin,f*Cout)


def wpack_conv3x3_kernel33(kernel: jnp.ndarray, f: int,
                           segment_channels: Optional[Sequence[int]] = None
                           ) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (3,3,f*Cin,f*Cout): the 3x2 phase-blocked
    kernel with the phase REGROUP folded in.

    The 3x2 conv produces M+1 positions whose phase groups are read at
    shifted positions (b < f-1 at j, b = f-1 at j+1). Folding the shift
    into the taps gives a single VALID 3x3 conv producing the final M
    positions directly — no post-conv regroup concat:

      out[j].A = xe[j] kp[:,0].A + xe[j+1] kp[:,1].A
      out[j].B = xe[j+1] kp[:,0].B + xe[j+2] kp[:,1].B

    where A = output lanes [0, (f-1)*Cout) and B = the rest.
    """
    kp = wpack_conv3x3_kernel(kernel, f, segment_channels)
    A = (f - 1) * kernel.shape[3]
    z0 = jnp.zeros_like(kp[:, 0, :, :A])
    z1 = jnp.zeros_like(kp[:, 0, :, A:])
    c0 = jnp.concatenate([kp[:, 0, :, :A], z1], axis=-1)
    c1 = jnp.concatenate([kp[:, 1, :, :A], kp[:, 0, :, A:]], axis=-1)
    c2 = jnp.concatenate([z0, kp[:, 1, :, A:]], axis=-1)
    return jnp.stack([c0, c1, c2], axis=1)  # (3,3,f*Cin,f*Cout)


def wpack_up2_kernels(kernel: jnp.ndarray, f: int):
    """Compose nearest-up2 with the 3x3 conv: (3,3,Cin,Cout) -> two
    (2,3,f*Cin,2f*Cout) kernels, one per output ROW phase.

    Y = conv3x3(nearest_up2(X)) evaluated without materializing the
    upsampled tensor. Output row o=2i+a of the up-res conv taps up rows
    o-1..o+1 = X rows {i-1,i,i} (a=0) / {i,i,i+1} (a=1), so each row
    phase is a 2-row-tap conv of X with row-combined weights
    (k0, k1+k2) / (k0+k1, k2). Width is the same composition per
    output phase b (orig up col 2f*j+b): up cols 2fj+b-1+d map to X
    cols f*j + (b+d-1)//2, a 3-packed-block window where only b=0
    spills left (X phase -1 = block j-1 phase f-1) and b=2f-1 spills
    right. The executed-FLOP count is 2*(2*3)/(2*9) = 2/3 of the conv
    on the materialized up tensor (input lanes halve: f*Cin vs 2f*Cin)
    and the (B,2H,M,2f*C) intermediate plus its broadcast/reduce
    adjoint pair disappear.
    """
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    F = 2 * f
    # row-combined 3-col-tap kernels: ka[a][rt] (3cols, Cin, Cout)
    ka = [[kernel[0], kernel[1] + kernel[2]],
          [kernel[0] + kernel[1], kernel[2]]]

    def build(a):
        rows = []
        for rt in range(2):
            kc = ka[a][rt]  # (3, Cin, Cout) col taps
            cols = []
            for cb in range(3):  # xe blocks j-1, j, j+1
                blocks_in = []
                for q in range(f):
                    r_rel = f * (cb - 1) + q
                    outs = []
                    for b in range(F):
                        w = None
                        for d in range(3):
                            if (b + d - 1) // 2 == r_rel:
                                w = (kc[d] if w is None
                                     else w + kc[d])
                        outs.append(w if w is not None else
                                    jnp.zeros((Cin, Cout),
                                              kernel.dtype))
                    blocks_in.append(jnp.concatenate(outs, axis=1))
                cols.append(jnp.concatenate(blocks_in, axis=0))
            rows.append(jnp.stack(cols, 0))
        return jnp.stack(rows, 0)  # (2, 3, f*Cin, F*Cout)

    return build(0), build(1)


def wpack_up2conv3x3_reflect(x: jnp.ndarray, kernel: jnp.ndarray,
                             bias: Optional[jnp.ndarray] = None,
                             f: int = 4, dtype=None) -> jnp.ndarray:
    """wpack(conv3x3(reflect_pad1(nearest_up2(X))) [+ bias], 2f) given
    wpack(X, f) — the fused upsample+conv used by the width-packed
    decoder (reference chain: layers.py upsample + Conv3x3).

    The reflect pad happens at the UP resolution, so every pad value is
    a NEAREST copy of X: up row -1 reflects to up row 1 = X row 0 and
    up col -1 to X col 0 (up index 2k+1 // 2 = k). xe is therefore X
    extended with verbatim row 0 / row H-1 copies and one pad block per
    side whose single tapped phase slot carries X col 0 / col W-1.
    Two VALID convs over xe (negative row padding selects each row
    phase's window) then interleave on the row dimension — outer-dim
    only, no lane/sublane retiling. Exact to float associativity
    (tests/test_packed_decoder.py::test_wpack_up2conv_exact).
    """
    dt = dtype or x.dtype
    x = x.astype(dt)
    B, H, M, FC = x.shape
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    assert FC == f * Cin, (FC, f, Cin)
    F = 2 * f
    ka0, ka1 = wpack_up2_kernels(kernel, f)
    ka0 = ka0.astype(dt)
    ka1 = ka1.astype(dt)

    # nearest pad blocks: left block phase f-1 slot <- X col 0
    # (block 0 phase 0); right block phase 0 slot <- X col W-1
    z = jnp.zeros((B, H, 1, (f - 1) * Cin), dt)
    left = jnp.concatenate([z, x[:, :, 0:1, 0:Cin]], axis=-1)
    right = jnp.concatenate(
        [x[:, :, M - 1:M, (f - 1) * Cin:f * Cin], z], axis=-1)
    xe = jnp.concatenate([left, x, right], axis=2)
    # nearest row pads: copies of rows 0 and H-1
    xe = jnp.concatenate([xe[:, 0:1], xe, xe[:, H - 1:H]], axis=1)

    # ONE lhs-dilated conv emits the interleaved rows directly — the
    # two-phase-conv + stack + reshape formulation lowered to ~3 HBM
    # relayout passes per pass (copy -> reshape -> copy; step trace,
    # scripts/trace_summary.py), the single most expensive non-conv
    # bucket of the bench step. With zero-interleaved rows Xz[2j] =
    # xe[j], out[o] = sum_s K4[s] Xz[o+s] reproduces exactly
    #   out[2i]   = ka0[0] xe[i]   + ka0[1] xe[i+1]   (row phase 0)
    #   out[2i+1] = ka1[0] xe[i+1] + ka1[1] xe[i+2]   (row phase 1)
    # via K4 = [ka0[0], ka1[0], ka0[1], ka1[1]] — the transposed-conv
    # identity XLA already phase-decomposes for stride-2 conv
    # backwards. An earlier K5 variant carried a trailing all-zero row
    # (plus one high pad row): the even output phase then executed 3
    # taps where 2 suffice — ~25% wasted phase FLOPs, visible as this
    # conv bucket running at 82 TF/s vs ~149 for its peers in the step
    # trace. Dropping the zero row is bit-exact and faster at both
    # decoder shapes (scripts/bench_dilated_taps.py: fwd 4.82->4.30 /
    # 5.37->4.33 ms, grad 4.63->4.27 / 4.59->4.27 ms). Exact to float
    # associativity (tests/test_packed_decoder.py pins vs the naive
    # chain).
    K4 = jnp.concatenate([ka0[0:1], ka1[0:1], ka0[1:2], ka1[1:2]],
                         axis=0)
    # xe has H+2 rows -> Xz has 2H+3; VALID 4-tap yields exactly 2H.
    y = jax.lax.conv_general_dilated(
        xe, K4, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, F).astype(dt)
    return y


def wpack_up2conv3x3_phases(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: Optional[jnp.ndarray] = None,
                            f: int = 4, dtype=None) -> jnp.ndarray:
    """The two-phase-conv + row-stack formulation of
    wpack_up2conv3x3_reflect — kept for parity testing against the
    lhs-dilated default (identical semantics, different lowering)."""
    dt = dtype or x.dtype
    x = x.astype(dt)
    B, H, M, FC = x.shape
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    assert FC == f * Cin, (FC, f, Cin)
    F = 2 * f
    ka0, ka1 = wpack_up2_kernels(kernel, f)
    ka0 = ka0.astype(dt)
    ka1 = ka1.astype(dt)
    z = jnp.zeros((B, H, 1, (f - 1) * Cin), dt)
    left = jnp.concatenate([z, x[:, :, 0:1, 0:Cin]], axis=-1)
    right = jnp.concatenate(
        [x[:, :, M - 1:M, (f - 1) * Cin:f * Cin], z], axis=-1)
    xe = jnp.concatenate([left, x, right], axis=2)
    xe = jnp.concatenate([xe[:, 0:1], xe, xe[:, H - 1:H]], axis=1)

    def conv(lhs, rhs, row_pad):
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1),
            padding=(row_pad, (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # xe has H+2 rows; a 2-row kernel yields H+1 positions. Row phase
    # a=0 wants windows (i, i+1) -> positions 0..H-1; a=1 wants
    # (i+1, i+2) -> positions 1..H. Negative window padding trims the
    # unused position inside the conv itself.
    y0 = conv(xe, ka0, (0, -1))  # (B,H,M,F*Cout)
    y1 = conv(xe, ka1, (-1, 0))
    y = jnp.stack([y0, y1], axis=2).reshape(B, 2 * H, M, F * Cout)
    if bias is not None:
        y = y + jnp.tile(bias, F).astype(dt)
    return y


def wpack_dispconv_kernel(kernel: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3,3,Cin,1) disparity-head kernel -> (f*Cin, 9*f) tap-split
    matrix: column t*f + q carries tap t = 3*dr + dc of output phase q,
    i.e. (X @ K)[..., t*f+q] = sum_c X[..., q*Cin+c] * kernel[dr,dc,c,0].
    """
    Cin = kernel.shape[2]
    k9 = kernel[..., 0].reshape(9, Cin)  # (t, c)
    # K[(q', c), (t, q)] = k9[t, c] * (q' == q)
    K = jnp.einsum("tc,uq->uctq", k9, jnp.eye(f, dtype=kernel.dtype))
    return K.reshape(f * Cin, 9 * f)


def wpack_dispconv(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None, f: int = 8,
                   dtype=None) -> jnp.ndarray:
    """wpack(conv3x3(reflect_pad1(X)) + bias, f) for a SINGLE-output-
    channel head (the disparity convs), given wpack(X, f).

    The phase-blocked MXU formulation (wpack_conv3x3_reflect) executes
    3*2*(f*Cin)*pad(f*1) MACs per packed position — with Cout=1 the
    output side pads f -> 128 lanes, a 16x waste at f=8 that made
    disp0 the roofline's worst layer (8.05 executed GFLOP per full
    320x1024 pass for 0.09 useful, scripts/roofline.py). This
    formulation splits the 3x3 into
      1. ONE 1x1 matmul contracting the channels for all nine taps at
         once: s[..., t*f+q] = sum_c x[..., q*C+c] * k[t, c]
         (wpack_dispconv_kernel; output 9f = 72 lanes at f=8, so the
         MXU pad is 128/72 instead of 128/8 and the executed FLOPs
         drop 6x: 128*128 vs 6*128*128 per position-row), and
      2. nine shifted elementwise adds in packed space: tap (dr, dc)
         of output phase q reads s row h+dr-1 at original column
         w+dc-1, i.e. lane group t shifted by one original column
         (a lane slice + one block roll at the group edge) and one
         row (an outer-dim slice) — pure VPU work XLA fuses.
    Reflection padding (rows -1 -> 1, H -> H-2; cols likewise) is
    applied in the shifts. Exact to float associativity; same
    (3,3,Cin,1) parameters (tests/test_packed_decoder.py).
    """
    dt = dtype or x.dtype
    x = x.astype(dt)
    B, H, M, FC = x.shape
    Cin = kernel.shape[2]
    assert FC == f * Cin and kernel.shape[3] == 1, (x.shape, kernel.shape, f)
    assert f >= 2 and M >= 2, (f, M)
    K = wpack_dispconv_kernel(kernel, f).astype(dt)
    # f32 accumulation inside the 16-term channel dot (as the conv
    # formulation's accumulator); the per-tap tensor is stored back at
    # the compute dtype (storing it f32 doubles the shift/add HBM
    # traffic for <1 ulp) and the 9-term tap sum accumulates in f32
    # registers (the casts+adds fuse into one output loop).
    s = jax.lax.dot_general(x, K, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(dt)

    def col_shift(g, dc):
        if dc == 0:  # tap column w-1; reflect col -1 -> col 1
            prev = jnp.concatenate(
                [g[:, :, 0:1, 1:2], g[:, :, :M - 1, f - 1:f]], axis=2)
            return jnp.concatenate([prev, g[..., :f - 1]], axis=-1)
        if dc == 2:  # tap column w+1; reflect col W -> col W-2
            nxt = jnp.concatenate(
                [g[:, :, 1:, 0:1], g[:, :, M - 1:M, f - 2:f - 1]],
                axis=2)
            return jnp.concatenate([g[..., 1:], nxt], axis=-1)
        return g

    def row_shift(g, dr):
        if dr == 0:  # tap row h-1; reflect row -1 -> row 1
            return jnp.concatenate([g[:, 1:2], g[:, :H - 1]], axis=1)
        if dr == 2:  # tap row h+1; reflect row H -> row H-2
            return jnp.concatenate([g[:, 1:], g[:, H - 2:H - 1]],
                                   axis=1)
        return g

    out = None
    for dr in range(3):
        for dc in range(3):
            t = 3 * dr + dc
            g = row_shift(col_shift(s[..., t * f:(t + 1) * f], dc), dr)
            g = g.astype(jnp.float32)
            out = g if out is None else out + g
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(dt)  # (B, H, M, f) = wpack(disp, f)


def _left_right_cols(x: jnp.ndarray, f: int, C_seg: Sequence[int]):
    """Reflect-adjusted pad block columns of a width-packed tensor.

    Only one phase slot of each pad block is ever tapped: the left pad
    block's q=f-1 slot (orig col -1 -> reflect -> col 1 = block 0
    phase 1) and the right pad block's q=0 slot (orig col W -> reflect
    -> col W-2 = block M-1 phase f-2). The other slots are zeros
    (structurally untapped). Built per segment.
    """
    B, H, M, _ = x.shape
    lefts, rights = [], []
    c0 = 0
    for C in C_seg:
        seg = x[..., c0 * f:(c0 + C) * f]
        z = jnp.zeros((B, H, 1, (f - 1) * C), seg.dtype)
        # left pad block: lanes [(f-1)C, fC) <- block 0, phase q=1
        lefts.append(jnp.concatenate(
            [z, seg[:, :, 0:1, C:2 * C]], axis=-1))
        # right pad block: lanes [0, C) <- block M-1, phase q=f-2
        rights.append(jnp.concatenate(
            [seg[:, :, M - 1:M, (f - 2) * C:(f - 1) * C], z], axis=-1))
        c0 += C
    cat = (lambda ts: ts[0] if len(ts) == 1
           else jnp.concatenate(ts, axis=-1))
    return cat(lefts), cat(rights)


def wpack_conv3x3_reflect(x, kernel: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          f: int = 8,
                          segment_channels: Optional[Sequence[int]] = None,
                          dtype=None) -> jnp.ndarray:
    """wpack(conv3x3(reflect_pad1(X)) + bias, f) given wpack(X, f).

    x: (B,H,M,f*Cin) width-packed input, or a LIST of width-packed
    tensors (channel concat, e.g. [up, skip]); kernel: (3,3,Cin,Cout)
    ORIGINAL parameters ordered like the unpacked concat; bias:
    (Cout,). Returns the width-packed (B,H,M,f*Cout) output.
    """
    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    if segment_channels is None:
        segment_channels = tuple(t.shape[-1] // f for t in xs)
    dt = dtype or xs[0].dtype
    xs = [t.astype(dt) for t in xs]
    xcat = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
    B, H, M, _ = xcat.shape
    cout = kernel.shape[-1]

    def conv(lhs, rhs, padding):
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Two exact strategies, chosen by measured regime (v5e, b32 bf16,
    # scripts/bench_wpack.py):
    #
    # "pad": build the reflect pad DIRECTLY in packed space — rows are
    # unpacked (reflect row -1 = row 1 verbatim), and of the col pad
    # blocks only one phase slot is ever tapped (left q=f-1 by output
    # phase 0, right q=0 by phase f-1 — see tap()), which
    # _left_right_cols fills with the reflected columns. One padded
    # copy + one VALID conv, no post-hoc corrections. Row reflect
    # commutes with the col extension so corner taps come out exactly
    # once. Wins when the packed input is narrow (f*Cin <= 128 lanes:
    # the padded copy is cheap, and it avoids four .at[].add
    # full-tensor copies on the 128-lane output).
    #
    # "corr": zero-padded SAME conv + four 1-row/1-col mini-conv
    # border corrections slice-added into y. Wins when the packed
    # input is wide (f*Cin > 128: the padded input copy and its bwd
    # cotangent dominate; 96->32 f=4 two-segment measured 9.7 vs
    # 20.5 ms f+b).
    if f * sum(segment_channels) <= 128:
        k33 = wpack_conv3x3_kernel33(kernel, f,
                                     segment_channels).astype(dt)
        left, right = _left_right_cols(xcat, f, segment_channels)
        xe = jnp.concatenate([left, xcat, right], axis=2)
        xe = jnp.concatenate([xe[:, 1:2], xe, xe[:, H - 2:H - 1]],
                             axis=1)  # (B,H+2,M+2,f*Cin)
        # regroup folded into the taps: one VALID conv, final layout
        out = conv(xe, k33, "VALID")  # (B,H,M,f*Cout)
        if bias is not None:
            out = out + jnp.tile(bias, f).astype(out.dtype)
        return out
    else:
        kp = wpack_conv3x3_kernel(kernel, f, segment_channels).astype(dt)
        y = conv(xcat, kp, ((1, 1), (1, 1)))  # (B,H,M+1,f*Cout)

        def row_corr(row, kslice):
            l, r = _left_right_cols(row, f, segment_channels)
            return conv(jnp.concatenate([l, row, r], axis=2), kslice,
                        "VALID")  # (B,1,M+1,f*Cout)

        # pad row -1 reflects to row 1, row H to row H-2; each
        # correction row is col-extended with ITS OWN pad blocks so
        # the corners are counted there exactly once (col corrections
        # below use zero row extension — inclusion-exclusion).
        y = y.at[:, 0:1].add(row_corr(xcat[:, 1:2], kp[0:1]))
        y = y.at[:, H - 1:H].add(row_corr(xcat[:, H - 2:H - 1],
                                          kp[2:3]))
        left, right = _left_right_cols(xcat, f, segment_channels)
        y = y.at[:, :, 0:1].add(conv(left, kp[:, 0:1],
                                     ((1, 1), (0, 0))))
        y = y.at[:, :, M:M + 1].add(conv(right, kp[:, 1:2],
                                         ((1, 1), (0, 0))))

    # phase groups: b < f-1 at positions 0..M-1, b = f-1 at 1..M
    out = jnp.concatenate(
        [y[:, :, 0:M, :(f - 1) * cout], y[:, :, 1:M + 1, (f - 1) * cout:]],
        axis=-1)
    if bias is not None:
        out = out + jnp.tile(bias, f).astype(out.dtype)
    return out
