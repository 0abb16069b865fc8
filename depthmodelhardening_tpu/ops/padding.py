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
    # out[0] = x[1], out[-1] = x[-2] (rows), same for columns.
    d = g[:, 1:-1, 1:-1, :]
    d = d.at[:, 1, :, :].add(g[:, 0, 1:-1, :])
    d = d.at[:, -2, :, :].add(g[:, -1, 1:-1, :])
    d = d.at[:, :, 1, :].add(g[:, 1:-1, 0, :])
    d = d.at[:, :, -2, :].add(g[:, 1:-1, -1, :])
    d = d.at[:, 1, 1, :].add(g[:, 0, 0, :])
    d = d.at[:, 1, -2, :].add(g[:, 0, -1, :])
    d = d.at[:, -2, 1, :].add(g[:, -1, 0, :])
    d = d.at[:, -2, -2, :].add(g[:, -1, -1, :])
    return (d,)


reflect_pad1.defvjp(_fwd, _bwd)
