"""Pallas packed stem-pool kernel: interpret-mode parity + grads.

Checks wpack4_maxpool3x3s2_pallas (ops/pallas_pool.py) against the
exact jnp slice-max chain (ops/wpack_encoder.py:wpack4_maxpool3x3s2)
— forward bit-exact, backward equal on tie-free (continuous random)
inputs, where equality routing and autodiff routing coincide.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import depthmodelhardening_tpu.ops.pallas_pool as pp
from depthmodelhardening_tpu.ops.wpack_encoder import wpack4_maxpool3x3s2


def _interp(fn, *args, **kw):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        return fn(*args, **kw)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("B,H,M,C", [(2, 16, 16, 8), (1, 32, 24, 4)])
def test_pool4_forward_parity(B, H, M, C):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, M, 4 * C),
                          jnp.float32)
    assert pp.pool4_supported(x.shape, C)
    ref = wpack4_maxpool3x3s2(x, C)
    out = _interp(pp.wpack4_maxpool3x3s2_pallas, x, C)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("B,H,M,C", [(2, 16, 16, 8), (1, 32, 24, 4)])
def test_pool4_grad_parity(B, H, M, C):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, M, 4 * C),
                          jnp.float32)
    # downstream cotangent: weighted sum so every output element has a
    # distinct gradient contribution
    w = jax.random.normal(jax.random.PRNGKey(2), (B, H // 2, M, 2 * C),
                          jnp.float32)

    g_ref = jax.grad(lambda t: jnp.sum(wpack4_maxpool3x3s2(t, C) * w))(x)
    g_pal = _interp(
        jax.grad(lambda t: jnp.sum(pp.wpack4_maxpool3x3s2_pallas(t, C)
                                   * w)), x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_pool4_grad_parity_bf16():
    # bf16's 8-bit mantissa makes bit-equal window ties likely with
    # random draws, and tie routing differs by design (equality
    # duplication vs jnp.maximum's half/half split) — so use distinct
    # values: a permutation of an arange is tie-free by construction
    B, H, M, C = (1, 16, 16, 8)
    n = B * H * M * 4 * C
    # distinct-by-construction bf16: consecutive uint16 bit patterns
    # of positive normal numbers, shuffled
    pats = np.arange(0x0100, 0x0100 + n, dtype=np.uint16)
    x = jax.lax.bitcast_convert_type(
        jnp.asarray(pats, jnp.uint16), jnp.bfloat16)
    x = jax.random.permutation(jax.random.PRNGKey(3), x).reshape(
        B, H, M, 4 * C)
    assert int(jnp.unique(x).size) == n
    w = jax.random.normal(jax.random.PRNGKey(4), (B, H // 2, M, 2 * C),
                          jnp.bfloat16)

    def loss(fn, t):
        return jnp.sum((fn(t, C) * w).astype(jnp.float32))

    g_ref = jax.grad(lambda t: loss(wpack4_maxpool3x3s2, t))(x)
    g_pal = _interp(jax.grad(
        lambda t: loss(pp.wpack4_maxpool3x3s2_pallas, t)), x)
    # multi-window contributions sum in bf16 under autodiff but in
    # f32 inside the pallas backward: allow 1-ulp-of-bf16 relative
    np.testing.assert_allclose(
        np.asarray(g_pal, np.float32), np.asarray(g_ref, np.float32),
        rtol=0.02, atol=0.02)


@pytest.mark.parametrize("B,H,M,C", [(2, 16, 16, 8)])
def test_pool4_hybrid_grad_parity(B, H, M, C):
    # the dispatched variant: jnp forward (bit-exact trivially), pallas
    # backward — same routing contract as the full-pallas kernel
    x = jax.random.normal(jax.random.PRNGKey(6), (B, H, M, 4 * C),
                          jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(7), (B, H // 2, M, 2 * C),
                          jnp.float32)
    fwd = _interp(pp.wpack4_maxpool3x3s2_hybrid, x, C)
    np.testing.assert_array_equal(np.asarray(fwd),
                                  np.asarray(wpack4_maxpool3x3s2(x, C)))
    g_ref = jax.grad(lambda t: jnp.sum(wpack4_maxpool3x3s2(t, C) * w))(x)
    g_hyb = _interp(
        jax.grad(lambda t: jnp.sum(pp.wpack4_maxpool3x3s2_hybrid(t, C)
                                   * w)), x)
    np.testing.assert_allclose(np.asarray(g_hyb), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_pool4_dispatch_falls_back_off_tpu():
    # on CPU (tests force jax_platforms=cpu) the dispatcher must take
    # the jnp chain, so values always match the naive pool
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 32),
                          jnp.float32)
    out = pp.maybe_pallas_pool4(x, 8)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(wpack4_maxpool3x3s2(x, 8)))
