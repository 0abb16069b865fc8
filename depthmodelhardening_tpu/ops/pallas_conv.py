"""Pallas TPU kernel: 3x3 VALID conv for small channel counts.

EXPLORATORY — correct but NOT wired into the decoder. The depth decoder
runs stride-1 3x3 convs on 16/32-channel full-res maps
(depth_decoder.py); XLA's TPU conv lane-pads 16 -> 128 channels and one
such conv at (32, 320, 1024, 16) measures ~16 ms where HBM-bound is
<1 ms. This kernel flattens rows (stride = lane-padded width) so each
of the nine taps is a single (Co, Cin) @ (Cin, rows*Wpad) MXU dot over
a lane-shifted slice of the VMEM strip.

Measured on v5e: 19.7 ms vs XLA's 16.0 ms at the shape above (and a
per-row-matmul variant at 16.9 ms) — the M=16 systolic rows cap MXU
utilization at 12.5% and Mosaic cannot contract across merged (row, W)
dims in any layout we found, so XLA's conv stays the default
(ops in the decoder keep nn.Conv). Kept with tests as the starting
point for future kernel work; `conv3x3_reflect` exposes the dispatch.

Semantics: VALID 3x3 conv on an already-padded input (the caller pads —
reflect for Conv3x3 — so padding autodiff stays with XLA). Gradients:
custom_vjp — input grad is the same kernel with the spatially-flipped,
transposed kernel on a zero-padded cotangent; weight grad falls back to
an XLA einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _conv3x3_valid_ref(xp, k):
    """Reference implementation. xp: (B, H+2, W+2, Cin); k: (3,3,Cin,Co).
    Returns (B, H, W, Co)."""
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _make_kernel(B, H, W, Wpad, Cin, Co, rt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = H // rt
    L = rt * Wpad  # flat output block length

    def kernel(x_hbm, k_ref, out_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)

        def body(xs, sem):
            r0 = i * rt
            # rows are stored flattened (row-major, stride Wpad >= W+2,
            # Wpad a lane multiple): a (dy, dx) tap is then ONE static
            # lane-shifted slice of the flat strip, so each tap is a
            # single large (Co,Cin)@(Cin, rt*Wpad) MXU dot — Mosaic
            # cannot contract across merged (row, W) dims otherwise.
            cp = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(r0 * Wpad, (rt + 3) * Wpad)], xs,
                sem)
            cp.start()
            cp.wait()

            acc = jnp.zeros((Co, L), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    off = dy * Wpad + dx
                    tap = xs[:, pl.ds(off, L)]  # (Cin, L) lane shift
                    kt = k_ref[:, (dy * 3 + dx) * Cin:
                               (dy * 3 + dx + 1) * Cin]
                    acc = acc + jax.lax.dot_general(
                        kt, tap, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            out_ref[0] = acc

        pl.run_scoped(
            body,
            xs=pltpu.VMEM((Cin, (rt + 3) * Wpad), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel, n_chunks


def _pick_rt(H: int) -> int:
    for t in (16, 8):
        if H % t == 0:
            return t
    return H


def _pallas_conv3x3_valid(xp, k):
    """xp: (B, H+2, W+2, Cin) f32; k: (3,3,Cin,Co) f32 -> (B,H,W,Co)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp, Wp, Cin = xp.shape
    H, W = Hp - 2, Wp - 2
    Co = k.shape[-1]
    rt = _pick_rt(H)

    # channel-major, rows flattened with stride Wpad (lane multiple)
    Wpad = ((Wp + 127) // 128) * 128
    xt = jnp.moveaxis(xp.astype(jnp.float32), -1, 1)  # (B, Cin, H+2, W+2)
    if Wpad != Wp:
        xt = jnp.concatenate(
            [xt, jnp.zeros((B, Cin, Hp, Wpad - Wp), jnp.float32)],
            axis=3)
    # one junk row so the last chunk's (rt+3)-row DMA stays in bounds
    xt = jnp.concatenate(
        [xt, jnp.zeros((B, Cin, 1, Wpad), jnp.float32)], axis=2)
    xt = xt.reshape(B, Cin, (Hp + 1) * Wpad)
    # k -> (Co, 9*Cin) matching the tap order ((dy,dx) major)
    km = jnp.transpose(k.astype(jnp.float32), (3, 0, 1, 2))  # Co,3,3,Cin
    km = km.reshape(Co, 9 * Cin)

    kernel, n_chunks = _make_kernel(B, H, W, Wpad, Cin, Co, rt)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Co, H * Wpad), jnp.float32),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, rt * Wpad),
                               lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
    )(xt, km)
    out = out.reshape(B, Co, H, Wpad)[:, :, :, :W]
    return jnp.moveaxis(out, 1, -1)


@jax.custom_vjp
def conv3x3_valid(xp, k):
    """Pallas 3x3 VALID conv (small-C fast path); see module docstring."""
    return _pallas_conv3x3_valid(xp, k)


def _fwd(xp, k):
    return _pallas_conv3x3_valid(xp, k), (xp, k)


def _bwd(res, g):
    xp, k = res
    # d x_pad: full correlation = VALID conv of the zero-padded cotangent
    # with the spatially flipped, in/out-transposed kernel
    kf = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Co,Cin)
    gp = jnp.pad(g, ((0, 0), (2, 2), (2, 2), (0, 0)))
    dx = _pallas_conv3x3_valid(gp, kf)
    # d k: XLA reduction (needed only for model training)
    dk = jax.lax.conv_general_dilated(
        jnp.transpose(xp, (3, 1, 2, 0)),    # (Cin, H+2, W+2, B)
        jnp.transpose(g, (1, 2, 0, 3)),     # (H, W, B, Co)
        (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)  # (Cin, 3, 3, Co)
    dk = jnp.moveaxis(dk, 0, 2)             # (3, 3, Cin, Co)
    return dx.astype(xp.dtype), dk.astype(k.dtype)


conv3x3_valid.defvjp(_fwd, _bwd)


def conv3x3_reflect(x, k, bias=None, use_pallas: bool = False):
    """Reflection-pad(1) + 3x3 conv (layers.py:121-136 semantics).

    Dispatches to the pallas kernel on TPU for stride-1 small-C maps;
    jnp/XLA elsewhere. x: (B, H, W, Cin) -> (B, H, W, Co)."""
    from .padding import reflect_pad1

    xp = reflect_pad1(x)
    small_c = x.shape[-1] <= 64 and k.shape[-1] <= 64
    aligned = x.shape[1] % 8 == 0 and x.shape[2] % 128 == 0
    from .dispatch import pallas_available

    # default False: measured slower than XLA's conv (see module doc)
    if use_pallas and small_c and aligned and pallas_available():
        out = conv3x3_valid(xp, k).astype(x.dtype)
    else:
        out = jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out
