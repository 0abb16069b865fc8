"""Packed (channel-major space-to-depth) decoder stages: exactness vs
the naive path. The packed form is the TPU layout optimization for the
decoder's lane-starved 16/32-channel convs (ops/packed_decoder.py);
it shares the parameter tree with the naive decoder and must match its
values and gradients to float-associativity tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.ops.packed_decoder import (
    pack2, packed_conv3x3_reflect, pack_conv3x3_kernel, tile4, unpack2,
)


def _ref_conv(x, k, b=None):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b if b is not None else y


def test_pack_roundtrip_and_tile4():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 7), jnp.float32)
    assert jnp.array_equal(unpack2(pack2(x)), x)
    up = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    assert jnp.array_equal(pack2(up), tile4(x))


@pytest.mark.parametrize("H,W,Cin,Cout", [(8, 12, 3, 5), (16, 8, 16, 16),
                                          (6, 6, 2, 1)])
def test_packed_conv_matches_reflect_conv(H, W, Cin, Cout):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, H, W, Cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, Cin, Cout), jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    ref = _ref_conv(x, k, b)
    got = unpack2(packed_conv3x3_reflect(pack2(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_packed_kernel_nonzeros():
    """The dense packed kernel carries exactly the 9 original taps per
    (cin, cout, output-phase) triple (the rest are structural zeros) —
    the 16/9 dense-FLOP overhead the 4x lane gain pays for."""
    k = jnp.ones((3, 3, 2, 3), jnp.float32)
    kp = pack_conv3x3_kernel(k)
    assert kp.shape == (2, 2, 8, 12)
    assert float(jnp.sum(kp != 0)) == 9 * 4 * 2 * 3


def test_packed_segmented_concat_upsample_skip():
    """The decoder chain conv(concat(up2(x), skip)) against
    packed([tile4(x), pack2(skip)]) — values and all gradients."""
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(2, 4, 6, 5), jnp.float32)
    s = jnp.asarray(rng.randn(2, 8, 12, 9), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 14, 11), jnp.float32)

    def ref(a, s, k):
        up = jnp.repeat(jnp.repeat(a, 2, 1), 2, 2)
        return _ref_conv(jnp.concatenate([up, s], -1), k)

    def packed(a, s, k):
        return unpack2(packed_conv3x3_reflect([tile4(a), pack2(s)], k))

    np.testing.assert_allclose(np.asarray(packed(a, s, k)),
                               np.asarray(ref(a, s, k)), atol=1e-4)
    gr = jax.grad(lambda *t: jnp.sum(jnp.sin(ref(*t))), (0, 1, 2))(a, s, k)
    gp = jax.grad(lambda *t: jnp.sum(jnp.sin(packed(*t))), (0, 1, 2))(a, s, k)
    for u, v in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   atol=2e-4)


def test_wpack_conv_matches_reflect_conv():
    """Width-packed conv (ops/wpack_decoder.py): values and gradients
    vs the reference reflect conv, across pack factors and segments."""
    from depthmodelhardening_tpu.ops.wpack_decoder import (
        wpack, wpack_conv3x3_reflect, wunpack,
    )

    rng = np.random.RandomState(4)
    # f*Cin <= 128 exercises the direct-pad branch, > 128 the
    # SAME+corrections branch (ops/wpack_decoder.py strategy switch)
    for (H, W, Cin, Cout, f) in [(6, 16, 3, 5, 8), (8, 32, 16, 16, 8),
                                 (5, 8, 2, 1, 4), (7, 12, 4, 6, 2),
                                 (6, 16, 24, 8, 8), (5, 12, 96, 7, 4)]:
        x = jnp.asarray(rng.randn(2, H, W, Cin), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, Cin, Cout), jnp.float32)
        b = jnp.asarray(rng.randn(Cout), jnp.float32)
        ref = _ref_conv(x, k, b)
        got = wunpack(wpack_conv3x3_reflect(wpack(x, f), k, b, f=f), f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    a = jnp.asarray(rng.randn(2, 6, 16, 5), jnp.float32)
    s = jnp.asarray(rng.randn(2, 6, 16, 9), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 14, 11), jnp.float32)

    def ref(a, s, k):
        return _ref_conv(jnp.concatenate([a, s], -1), k)

    def wp(a, s, k):
        return wunpack(wpack_conv3x3_reflect(
            [wpack(a, 8), wpack(s, 8)], k, f=8), 8)

    np.testing.assert_allclose(np.asarray(wp(a, s, k)),
                               np.asarray(ref(a, s, k)), atol=2e-4)
    gr = jax.grad(lambda *t: jnp.sum(jnp.sin(ref(*t))), (0, 1, 2))(a, s, k)
    gw = jax.grad(lambda *t: jnp.sum(jnp.sin(wp(*t))), (0, 1, 2))(a, s, k)
    for u, v in zip(gr, gw):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   atol=5e-4)

    # two segments on the corrections branch (f*Cin = 384 > 128),
    # the real upconv_1_1 regime (32 up + 64 skip, f=4)
    a = jnp.asarray(rng.randn(2, 5, 12, 32), jnp.float32)
    s = jnp.asarray(rng.randn(2, 5, 12, 64), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 96, 6), jnp.float32)

    def wp4(a, s, k):
        return wunpack(wpack_conv3x3_reflect(
            [wpack(a, 4), wpack(s, 4)], k, f=4), 4)

    np.testing.assert_allclose(np.asarray(wp4(a, s, k)),
                               np.asarray(ref(a, s, k)), atol=2e-3)
    gr = jax.grad(lambda *t: jnp.sum(jnp.sin(ref(*t))), (0, 1, 2))(a, s, k)
    gw = jax.grad(lambda *t: jnp.sum(jnp.sin(wp4(*t))), (0, 1, 2))(a, s, k)
    for u, v in zip(gr, gw):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   atol=5e-3)


def test_wpack_dispconv_matches_reflect_conv():
    """Tap-split single-channel head (ops/wpack_decoder.py
    wpack_dispconv): values and gradients vs the reference reflect
    conv at every decoder disp-head regime (f=8/4/2, incl. the
    transient f=2 packing of the naive-stage scale-2/3 heads)."""
    from depthmodelhardening_tpu.ops.wpack_decoder import (
        wpack, wpack_dispconv, wunpack,
    )

    rng = np.random.RandomState(7)
    for (H, W, Cin, f) in [(6, 32, 16, 8), (5, 16, 32, 4),
                           (7, 12, 64, 2), (4, 8, 128, 2),
                           (6, 16, 3, 8)]:
        x = jnp.asarray(rng.randn(2, H, W, Cin), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, Cin, 1), jnp.float32)
        b = jnp.asarray(rng.randn(1), jnp.float32)

        def ref(x, k, b):
            return _ref_conv(x, k, b)

        def tap(x, k, b, _f=f):
            return wunpack(wpack_dispconv(wpack(x, _f), k, b, f=_f),
                           _f)

        np.testing.assert_allclose(np.asarray(tap(x, k, b)),
                                   np.asarray(ref(x, k, b)), atol=2e-4)
        gr = jax.grad(lambda *t: jnp.sum(jnp.sin(ref(*t))),
                      (0, 1, 2))(x, k, b)
        gt = jax.grad(lambda *t: jnp.sum(jnp.sin(tap(*t))),
                      (0, 1, 2))(x, k, b)
        for u, v in zip(gr, gt):
            np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                       atol=5e-4)


def _model_outs_and_grad(model, v, x):
    """ONE trace per model: all disparity scales + input gradient
    (tracing the ~200-module model dominates this file's wall time,
    so the apply / grad / multi-scale checks share a single
    value_and_grad(has_aux=True) program)."""

    def loss(x):
        _, outs = model.apply(v, x, train=False,
                              method=model.features_and_disps)
        return jnp.sum(outs[("disp", 0)] ** 2), outs

    (_, outs), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(x)
    return outs, g


@pytest.mark.slow  # heaviest parity compile (VERDICT r4 #6: keep the fast suite ~5 min); a lighter same-area case stays fast
def test_wpack_decoder_model_parity():
    """Full MonodepthModel with wpack_decoder=True: same parameter
    tree, same disparities (all scales) and input gradients as the
    naive model."""
    from depthmodelhardening_tpu.models.wrappers import MonodepthModel

    H, W = 64, 96
    naive = MonodepthModel(num_layers=18)
    wp = MonodepthModel(num_layers=18, wpack_decoder=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, H, W, 3))
    v = naive.init(jax.random.PRNGKey(1), x, train=False)
    v2 = wp.init(jax.random.PRNGKey(1), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    outs_ref, g_ref = _model_outs_and_grad(naive, v, x)
    outs_wp, g_wp = _model_outs_and_grad(wp, v, x)
    assert set(outs_ref) == set(outs_wp)
    for key in outs_ref:
        np.testing.assert_allclose(np.asarray(outs_wp[key]),
                                   np.asarray(outs_ref[key]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_wp), np.asarray(g_ref),
                               atol=1e-5)


@pytest.mark.slow
def test_packed_decoder_model_parity():
    """Full MonodepthModel: packed_decoder=True shares the parameter
    tree and reproduces the naive model's disparities and input
    gradients."""
    from depthmodelhardening_tpu.models.wrappers import MonodepthModel

    H, W = 64, 96
    naive = MonodepthModel(num_layers=18)
    packed = MonodepthModel(num_layers=18, packed_decoder=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, H, W, 3))
    v = naive.init(jax.random.PRNGKey(1), x, train=False)
    # identical parameter trees (packed consumes the same params)
    v2 = packed.init(jax.random.PRNGKey(1), x, train=False)
    t1 = jax.tree_util.tree_structure(v)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2

    outs_ref, g_ref = _model_outs_and_grad(naive, v, x)
    outs_pk, g_pk = _model_outs_and_grad(packed, v, x)
    assert set(outs_ref) == set(outs_pk)
    for key in outs_ref:
        np.testing.assert_allclose(np.asarray(outs_pk[key]),
                                   np.asarray(outs_ref[key]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                               atol=1e-5)


def test_wlane_up2_exact():
    """ops/wpack_decoder.wlane_up2 == nearest_upsample2 in packed
    space, several (f, C, shape) combos."""
    from depthmodelhardening_tpu.ops.resize import nearest_upsample2
    from depthmodelhardening_tpu.ops.wpack_decoder import (
        wlane_up2, wpack, wunpack,
    )

    rng = np.random.RandomState(3)
    for (H, W, C, f) in ((6, 16, 3, 2), (4, 24, 16, 4), (5, 32, 8, 8)):
        x = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
        ref = nearest_upsample2(x)
        got = wunpack(wlane_up2(wpack(x, f), f, C), 2 * f)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_wpack_up2conv_exact():
    """wpack_up2conv3x3_reflect(X) == reflect-conv3x3 of the
    materialized nearest-up2, values and input/kernel grads, across
    (f, C, H, W) combos including W/f = 2 blocks."""
    from depthmodelhardening_tpu.ops.padding import reflect_pad1
    from depthmodelhardening_tpu.ops.resize import nearest_upsample2
    from depthmodelhardening_tpu.ops.wpack_decoder import (
        wpack, wpack_up2conv3x3_reflect, wunpack,
    )

    def ref_conv(x, k, b):
        up = nearest_upsample2(x)
        xe = reflect_pad1(up)
        return jax.lax.conv_general_dilated(
            xe, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    rng = np.random.RandomState(7)
    for (H, W, C, Cout, f) in ((6, 16, 3, 5, 2), (4, 24, 16, 16, 4),
                               (5, 16, 4, 2, 8), (3, 8, 6, 4, 4)):
        x = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, C, Cout).astype(np.float32))
        b = jnp.asarray(rng.randn(Cout).astype(np.float32))

        ref = ref_conv(x, k, b)
        got = wunpack(
            wpack_up2conv3x3_reflect(wpack(x, f), k, b, f=f), 2 * f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        def loss_ref(x, k):
            return jnp.sum(jnp.sin(ref_conv(x, k, b)))

        def loss_got(x, k):
            return jnp.sum(jnp.sin(wunpack(
                wpack_up2conv3x3_reflect(wpack(x, f), k, b, f=f),
                2 * f)))

        gr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
        gg = jax.grad(loss_got, argnums=(0, 1))(x, k)
        for a, bb in zip(gr, gg):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)


def test_wpack_up2conv_phases_matches_dilated():
    """The kept two-phase-conv formulation == the lhs-dilated default
    (same semantics, different lowering), values and grads."""
    from depthmodelhardening_tpu.ops.wpack_decoder import (
        wpack, wpack_up2conv3x3_phases, wpack_up2conv3x3_reflect,
    )

    rng = np.random.RandomState(11)
    for (H, W, C, Cout, f) in ((4, 24, 16, 16, 4), (5, 16, 4, 2, 8)):
        x = jnp.asarray(rng.rand(2, H, W, C).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, C, Cout).astype(np.float32))
        b = jnp.asarray(rng.randn(Cout).astype(np.float32))
        a = wpack_up2conv3x3_reflect(wpack(x, f), k, b, f=f)
        p = wpack_up2conv3x3_phases(wpack(x, f), k, b, f=f)
        np.testing.assert_allclose(np.asarray(p), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)
        ga = jax.grad(lambda x: jnp.sum(jnp.sin(
            wpack_up2conv3x3_reflect(wpack(x, f), k, b, f=f))))(x)
        gp = jax.grad(lambda x: jnp.sum(jnp.sin(
            wpack_up2conv3x3_phases(wpack(x, f), k, b, f=f))))(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ga),
                                   rtol=2e-4, atol=2e-4)
