"""Fused Pallas reprojection-loss kernel: interpret-mode parity + vjp.

The on-TPU compiled path is exercised by bench/training runs; CPU CI
validates the kernel logic via the pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import depthmodelhardening_tpu.ops.pallas_reproj as pr
from depthmodelhardening_tpu.ops.losses import reprojection_loss


def _interp(fn, *args):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        return fn(*args)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("shape", [(2, 64, 128, 3), (1, 40, 256, 3)])
def test_kernel_matches_jnp(shape):
    x = jax.random.uniform(jax.random.PRNGKey(0), shape)
    y = jax.random.uniform(jax.random.PRNGKey(1), shape)
    ref = pr._jnp_forward(x, y)
    out = _interp(pr._pallas_forward, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)


@pytest.mark.slow
def test_custom_vjp_grad_matches_jnp_grad():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 128, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 128, 3))

    def f_fused(a):
        return jnp.sum(_interp(pr.fused_reprojection_loss, a, y))

    def f_ref(a):
        return jnp.sum(pr._jnp_forward(a, y))

    g1 = jax.grad(f_fused)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5)


def test_losses_dispatch_off_tpu():
    """On CPU the public reprojection_loss stays on the jnp path and
    keeps the (B, H, W, 1) contract."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 32, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 32, 3))
    out = reprojection_loss(x, y)
    assert out.shape == (2, 16, 32, 1)
    ref = 0.85 * jnp.mean(pr.jnp_ssim(x, y), -1, keepdims=True) + \
        0.15 * jnp.mean(jnp.abs(x - y), -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-7)
