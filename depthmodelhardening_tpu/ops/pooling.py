"""Max pooling with a TPU-fast backward.

The ResNet stem's 3x3/s2 max pool (resnet_encoder.py:41 via
torchvision resnet.maxpool) sits in every model pass of the train step.
Hypothesis was that XLA's SelectAndScatter backward is a TPU slow spot;
MEASURED OTHERWISE (scripts/bench_hotspots.py, v5e b32 bf16): S&S
fwd+bwd costs only ~0.5-4 ms over fwd at stem shapes, while this
9-tap equality-mask + interior-dilated-pad rewrite runs 12-14x SLOWER
(the nine dilated pads do not fuse — each materializes a full
input-sized tensor). Kept as a tested, documented dead end
(tests/test_ops.py::test_max_pool_3x3_s2_parity); NOT wired into
models/resnet.py, which keeps nn.max_pool and its S&S autodiff.

Tie semantics: positions that EQUAL the window max all receive the
window's cotangent (the standard subgradient). Torch's MaxPool2d routes
it to the first argmax only; the two differ only when two pixels in one
3x3 window are bit-equal — measure-zero for continuous activations and
irrelevant for the sign/Adam updates consuming these gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _maxpool_fwd_raw(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/s2 max pool, padding 1, NHWC (matches
    nn.max_pool(x, (3,3), strides=(2,2), padding=((1,1),(1,1))))."""
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


@jax.custom_vjp
def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return _maxpool_fwd_raw(x)


def _fwd(x):
    y = _maxpool_fwd_raw(x)
    return y, (x, y)


def _bwd(res, g):
    x, y = res
    B, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=neg)
    gz = jnp.zeros((B, H + 2, W + 2, C), g.dtype)
    for ty in range(3):
        for tx in range(3):
            # window at output (oy, ox) covers padded rows 2*oy + ty
            xs = lax.slice(
                xp, (0, ty, tx, 0),
                (B, ty + 2 * Ho - 1, tx + 2 * Wo - 1, C),
                (1, 2, 2, 1))
            c = g * (xs == y).astype(g.dtype)
            # scatter back to padded positions ty::2 — an
            # interior-dilated pad (pure data movement, fuses)
            gz = gz + lax.pad(
                c, jnp.asarray(0, g.dtype),
                ((0, 0, 0),
                 (ty, H + 3 - ty - 2 * Ho, 1),
                 (tx, W + 3 - tx - 2 * Wo, 1),
                 (0, 0, 0)))
    return (gz[:, 1:H + 1, 1:W + 1].astype(x.dtype),)


max_pool_3x3_s2.defvjp(_fwd, _bwd)
