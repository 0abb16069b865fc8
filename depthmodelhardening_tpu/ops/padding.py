"""Reflection padding with a slice-add adjoint.

The decoder's Conv3x3 reflection-pads every feature map
(layers.py:121-136). XLA's autodiff of jnp.pad(mode="reflect") lowers
the transpose through a general scatter path that costs more than the
conv itself on TPU — measured at the attack-crop decoder shapes
(b32 bf16): reflect-pad convs ran 51.5 ms fwd+bwd vs 24.1 ms for
zero-pad across the four hot stages (scripts/bench_decoder_stages.py).
The true pad transpose is just the interior crop plus eight reflected
edge/corner slice-adds, which this custom VJP implements directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def reflect_pad1(x):
    """jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)), mode="reflect") for NHWC
    (requires H >= 2 and W >= 2, like reflect padding itself)."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def _fwd(x):
    return reflect_pad1(x), None


def _bwd(_, g):
    # interior crop + reflected edge/corner contributions:
    # out[0] = x[1], out[-1] = x[-2] (rows), same for columns. Indices
    # clamp for size-1 axes (numpy reflect: a single line is its own
    # reflection), matching jnp.pad's behavior there.
    H, W = g.shape[1] - 2, g.shape[2] - 2
    r1, rm = min(1, H - 1), max(H - 2, 0)
    c1, cm = min(1, W - 1), max(W - 2, 0)
    d = g[:, 1:-1, 1:-1, :]
    d = d.at[:, r1, :, :].add(g[:, 0, 1:-1, :])
    d = d.at[:, rm, :, :].add(g[:, -1, 1:-1, :])
    d = d.at[:, :, c1, :].add(g[:, 1:-1, 0, :])
    d = d.at[:, :, cm, :].add(g[:, 1:-1, -1, :])
    d = d.at[:, r1, c1, :].add(g[:, 0, 0, :])
    d = d.at[:, r1, cm, :].add(g[:, 0, -1, :])
    d = d.at[:, rm, c1, :].add(g[:, -1, 0, :])
    d = d.at[:, rm, cm, :].add(g[:, -1, -1, :])
    return (d,)


reflect_pad1.defvjp(_fwd, _bwd)


def conv3x3_reflect_same(x, kernel, bias=None, dtype=None,
                         precision=None):
    """Reflect-pad(1) + 3x3 VALID conv, decomposed EXACTLY as a
    zero-SAME conv plus 1-D border corrections.

    Even with the slice-add pad adjoint, materializing the padded
    tensor keeps the conv off XLA's fused SAME path (measured ~35%
    slower fwd+bwd at the decoder shapes). The reflect pad only changes
    the one-pixel output border: each border row/col gains the
    reflected row's 1-D 3-tap conv, and the four corners subtract the
    doubly-counted double-reflection term. All corrections are
    O(H+W) einsums.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Co). Size-1 axes follow
    numpy's reflect semantics (the single line is its own reflection),
    which keeps the tiny deepest decoder maps of low-res tests exact.
    """
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    B, H, W = x.shape[:3]
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)
    # reflected neighbor indices, clamped for size-1 axes
    r1, rm = min(1, H - 1), max(H - 2, 0)
    c1, cm = min(1, W - 1), max(W - 2, 0)

    def edge(vec, krow, n1, nm):
        """vec (B, N, Cin): the reflected neighbor line; krow
        (3, Cin, Co): the kernel row/col hanging off the border.
        Returns (B, N, Co) with the line's own reflect ends."""
        ext = jnp.concatenate(
            [vec[:, n1:n1 + 1], vec, vec[:, nm:nm + 1]], axis=1)
        taps = jnp.stack([ext[:, :-2], ext[:, 1:-1], ext[:, 2:]],
                         axis=2)  # (B, N, 3, Cin)
        return jnp.einsum("bntc,tco->bno", taps, krow,
                          precision=precision)

    y = y.at[:, 0].add(edge(x[:, r1], kernel[0], c1, cm))
    y = y.at[:, -1].add(edge(x[:, rm], kernel[2], c1, cm))
    y = y.at[:, :, 0].add(edge(x[:, :, c1], kernel[:, 0], r1, rm))
    y = y.at[:, :, -1].add(edge(x[:, :, cm], kernel[:, 2], r1, rm))

    def corner(px, kc):
        return jnp.einsum("bc,co->bo", px, kc, precision=precision)

    y = y.at[:, 0, 0].add(-corner(x[:, r1, c1], kernel[0, 0]))
    y = y.at[:, 0, -1].add(-corner(x[:, r1, cm], kernel[0, 2]))
    y = y.at[:, -1, 0].add(-corner(x[:, rm, c1], kernel[2, 0]))
    y = y.at[:, -1, -1].add(-corner(x[:, rm, cm], kernel[2, 2]))
    if bias is not None:
        y = y + (bias.astype(dtype) if dtype is not None else bias)
    return y
