"""Fused nearest-upsample2 + reflect-pad + 3x3 conv (exact rewrite).

The Monodepth2 decoder interleaves nearest x2 upsampling with
reflection-padded 3x3 convs (depth_decoder.py:50-65, layers.py:121-136
in the reference). Computed literally on TPU this materializes the 4x
upsampled tensor and runs the conv at full resolution with the
decoder's shallow channel counts (16/32), which pad out 128-wide MXU
lanes 8x/4x.

Because nearest-upsampled data is piecewise constant over 2x2 blocks,
the composition  conv3x3(reflect_pad(upsample2(x)))  is EXACTLY a
single 2x2 conv over edge-padded x producing the four output phases as
channels:

  output row 2i+a taps full-res rows 2i+a-1 .. 2i+a+1, which collapse
  to low-res rows (i-1, i) for phase a=0 with row weights
  [w0, w1+w2], and (i, i+1) for phase a=1 with [w0+w1, w2]
  (w_p = original kernel rows); columns likewise. Reflection padding
  at full resolution maps row -1 -> row 1 -> low row 0, i.e. edge
  padding of the low-res input reproduces it exactly (same at the
  bottom/right borders).

So: edge-pad x by 1, one VALID 2x2 conv with a (2,2,Cin,4*Cout) kernel
assembled from the 3x3 kernel, slice the four phases (phase a=1 reads
the conv output shifted by one block), interleave. 4x more output
lanes, 16 effective taps instead of 36, and no upsampled intermediate.
Gradients flow through the kernel assembly, so the backward pass is
the adjoint of the fused form as well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_upconv_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) full-res kernel -> (2,2,Cin,4*Cout) phase-packed
    2x2 kernel. Phase order along the output axis: (a,b) =
    (0,0),(0,1),(1,0),(1,1) blocked as 4 groups of Cout."""
    w = kernel
    # row tap groups per phase a and low-offset u (0 -> row i-1, 1 -> i)
    # a=0: u0 <- {p0}, u1 <- {p1,p2}; a=1 (window shifted one block):
    # u0 <- {p0,p1}, u1 <- {p2}
    r0 = jnp.stack([w[0], w[1] + w[2]])          # (2,3,Cin,Cout) a=0
    r1 = jnp.stack([w[0] + w[1], w[2]])          # (2,3,Cin,Cout) a=1
    phases = []
    for ra in (r0, r1):
        c0 = jnp.stack([ra[:, 0], ra[:, 1] + ra[:, 2]], axis=1)
        c1 = jnp.stack([ra[:, 0] + ra[:, 1], ra[:, 2]], axis=1)
        phases.extend([c0, c1])                  # each (2,2,Cin,Cout)
    return jnp.concatenate(phases, axis=-1)      # (2,2,Cin,4*Cout)


def fused_upsample_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray | None = None,
                           interleave: bool = True) -> jnp.ndarray:
    """== conv3x3_valid(reflect_pad1(nearest_upsample2(x))) + bias.

    x: (B,h,w,Cin); kernel: (3,3,Cin,Cout) of the full-res conv.
    Returns (B,2h,2w,Cout), or the phase-packed (B,h,w,2,2,Cout) when
    `interleave=False` (axes 3/4 are the row/col phases)."""
    B, h, w, _ = x.shape
    cout = kernel.shape[-1]
    kp = pack_upconv_kernel(kernel).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B,h+1,w+1,4C)
    y00 = y[:, :h, :w, 0 * cout:1 * cout]
    y01 = y[:, :h, 1:, 1 * cout:2 * cout]
    y10 = y[:, 1:, :w, 2 * cout:3 * cout]
    y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
    out = jnp.stack([jnp.stack([y00, y01], axis=3),
                     jnp.stack([y10, y11], axis=3)], axis=2)
    # (B,h,2,w,2,C): out[:, i, a, j, b] = phase(a,b) at block (i,j)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if not interleave:
        return out.transpose(0, 1, 3, 2, 4, 5)   # (B,h,w,2,2,C)
    return out.reshape(B, 2 * h, 2 * w, cout)


def pack_stem_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(7,7,Cin,Cout) stride-2 stem kernel -> (4,4,4*Cin,Cout) kernel
    over 2x2 space-to-depth blocked input.

    Output row i of the stride-2 conv taps full-res rows 2i+p-3
    (p=0..6), i.e. blocked rows i+(u-2) at phase a with p = 2(u-2)+3+a;
    (u=0, a=0) falls outside the 7-tap window and gets a zero tap.
    Blocked channel order (a, b, c) matches a reshape-based
    space-to-depth with c fastest."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    zero = jnp.zeros((cin, cout), kernel.dtype)
    rows = []
    for u in range(4):
        cols = []
        for v in range(4):
            taps = []
            for a in range(2):
                p = 2 * (u - 2) + 3 + a
                for b in range(2):
                    q = 2 * (v - 2) + 3 + b
                    taps.append(kernel[p, q]
                                if 0 <= p < 7 and 0 <= q < 7 else zero)
            cols.append(jnp.stack(taps, 0).reshape(4 * cin, cout))
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)  # (4,4,4*Cin,Cout)


def s2d_stem_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """== conv7x7_stride2_pad3(x, kernel) (the ResNet stem), computed as
    a stride-1 4x4 conv over the 2x2 space-to-depth blocking of x —
    4x the input channels (12 vs 3), quarter the positions, exact to
    float associativity. H and W must be even."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError("s2d stem needs even H, W")
    xb = x.reshape(B, H // 2, 2, W // 2, 2, C)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2,
                                                4 * C)
    kp = pack_stem_kernel(kernel).astype(x.dtype)
    # padding carried by the conv itself: an explicit jnp.pad costs a
    # materialized copy AND makes the backward emit a standalone pad of
    # the stem cotangent per attack step (~1.5 ms/step in the step
    # profile) — the conv's internal padding fuses both directions
    return jax.lax.conv_general_dilated(
        xb, kp, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
