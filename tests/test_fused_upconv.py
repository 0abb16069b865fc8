"""Exactness of the fused upsample+reflect-pad+conv3x3 rewrite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.ops.fused_upconv import (
    fused_upsample_conv3x3, pack_upconv_kernel)
from depthmodelhardening_tpu.ops.resize import nearest_upsample2


def _naive(x, kernel, bias):
    up = nearest_upsample2(x)
    up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        up, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def test_fused_matches_naive():
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, (2, 5, 7, 6))
    kernel = jax.random.normal(k2, (3, 3, 6, 4)) * 0.2
    bias = jax.random.normal(k3, (4,))
    ref = _naive(x, kernel, bias)
    out = fused_upsample_conv3x3(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_packed_layout():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (1, 4, 4, 3))
    kernel = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 3, 2))
    full = fused_upsample_conv3x3(x, kernel)
    packed = fused_upsample_conv3x3(x, kernel, interleave=False)
    assert packed.shape == (1, 4, 4, 2, 2, 2)
    re = packed.transpose(0, 1, 3, 2, 4, 5).reshape(1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(re), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


def test_fused_gradients_match_naive():
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (1, 4, 6, 3))
    kernel = jax.random.normal(jax.random.fold_in(k, 5), (3, 3, 3, 2))
    bias = jnp.zeros((2,))

    g_ref = jax.grad(lambda kk: jnp.sum(jnp.sin(
        _naive(x, kk, bias))))(kernel)
    g_fused = jax.grad(lambda kk: jnp.sum(jnp.sin(
        fused_upsample_conv3x3(x, kk, bias))))(kernel)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    gx_ref = jax.grad(lambda xx: jnp.sum(jnp.sin(
        _naive(xx, kernel, bias))))(x)
    gx_fused = jax.grad(lambda xx: jnp.sum(jnp.sin(
        fused_upsample_conv3x3(xx, kernel, bias))))(x)
    np.testing.assert_allclose(np.asarray(gx_fused),
                               np.asarray(gx_ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_decoder_fused_flag_identical_params_and_outputs():
    from depthmodelhardening_tpu.models.depth_decoder import DepthDecoder

    k = jax.random.PRNGKey(3)
    feats = [
        jax.random.normal(jax.random.fold_in(k, i),
                          (1, 16 // (2 ** i), 32 // (2 ** i), c))
        for i, c in enumerate([8, 8, 16, 32, 64])
    ]
    naive = DepthDecoder()
    fused = DepthDecoder(fuse_upconv=True)
    v = naive.init(k, feats)
    v2 = fused.init(k, feats)
    # identical parameter trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape

    out_n = naive.apply(v, feats)
    out_f = fused.apply(v, feats)
    for key in out_n:
        np.testing.assert_allclose(np.asarray(out_f[key]),
                                   np.asarray(out_n[key]),
                                   rtol=1e-5, atol=1e-6)


def test_s2d_stem_matches_conv7x7():
    from depthmodelhardening_tpu.ops.fused_upconv import s2d_stem_conv

    k = jax.random.PRNGKey(4)
    x = jax.random.normal(k, (2, 12, 16, 3))
    kernel = jax.random.normal(jax.random.fold_in(k, 1),
                               (7, 7, 3, 5)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = s2d_stem_conv(x, kernel)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_encoder_s2d_flag_identical_params_and_outputs():
    from depthmodelhardening_tpu.models.resnet import ResnetEncoder

    k = jax.random.PRNGKey(5)
    x = jax.random.uniform(k, (1, 32, 64, 3))
    naive = ResnetEncoder(num_layers=18)
    fused = ResnetEncoder(num_layers=18, s2d_stem=True)
    v = naive.init(k, x)
    v2 = fused.init(k, x)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)
    fn = naive.apply(v, x)
    ff = fused.apply(v, x)
    for a, b in zip(fn, ff):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
