"""Exploratory pallas conv3x3 kernel: interpret-mode parity + grads."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import depthmodelhardening_tpu.ops.pallas_conv as pc


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


def test_conv_kernel_matches_xla():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 128, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 8)) * 0.1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    ref = pc._conv3x3_valid_ref(xp, k)
    out = _interp(pc._pallas_conv3x3_valid, xp, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-6)


def test_conv_kernel_grads_match():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 128, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8)) * 0.1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    g = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 128, 8))

    gx_c = _interp(jax.grad(
        lambda a: jnp.sum(pc.conv3x3_valid(a, k) * g)), xp)
    gx_r = jax.grad(
        lambda a: jnp.sum(pc._conv3x3_valid_ref(a, k) * g))(xp)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_r),
                               atol=1e-5)

    gk_c = _interp(jax.grad(
        lambda kk: jnp.sum(pc.conv3x3_valid(xp, kk) * g)), k)
    gk_r = jax.grad(
        lambda kk: jnp.sum(pc._conv3x3_valid_ref(xp, kk) * g))(k)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_r),
                               atol=1e-4)


def test_conv3x3_reflect_dispatch_cpu():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 128, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (8,)) * 0.1
    out = pc.conv3x3_reflect(x, k, b)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    ref = pc._conv3x3_valid_ref(xp, k) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
