"""Width-packed encoder stages (ops/wpack_encoder.py): exactness of
the 4x4-s2d stem, packed max pool, packed zero-SAME conv, packed
BatchNorm, and the full flag-gated encoder vs the naive ResNet."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from depthmodelhardening_tpu.ops.wpack_decoder import wpack, wunpack
from depthmodelhardening_tpu.ops.wpack_encoder import (
    s2d4_stem_conv, wpack_conv3x3_zero, wpack_maxpool3x3s2,
)


def test_s2d4_stem_conv_matches_7x7_stride2():
    rng = np.random.RandomState(0)
    for (H, W, Cin) in ((16, 24, 3), (12, 16, 6), (8, 8, 3)):
        x = jnp.asarray(rng.randn(2, H, W, Cin), jnp.float32)
        k = jnp.asarray(rng.randn(7, 7, Cin, 64), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = wunpack(s2d4_stem_conv(x, k), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

        # input gradient (the attack loop differentiates through the
        # stem wrt the composited scene)
        gr = jax.grad(lambda x: jnp.sum(jnp.sin(
            jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))))(x)
        gg = jax.grad(lambda x: jnp.sum(jnp.sin(
            wunpack(s2d4_stem_conv(x, k), 2))))(x)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)


def test_wpack_maxpool_matches_naive():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    for (H, W) in ((16, 24), (8, 16)):
        x = jnp.asarray(rng.randn(2, H, W, 64), jnp.float32)
        ref = nn.max_pool(x, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        got = wpack_maxpool3x3s2(wpack(x, 2))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_wpack_conv3x3_zero_matches_same_conv():
    rng = np.random.RandomState(2)
    for (H, W, C, f) in ((6, 16, 64, 2), (5, 24, 16, 4)):
        x = jnp.asarray(rng.randn(2, H, W, C), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, C, C), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = wunpack(wpack_conv3x3_zero(wpack(x, f), k, f), f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_packed_batchnorm_matches_flax_train_and_eval():
    import flax.linen as nn

    from depthmodelhardening_tpu.models.resnet import PackedBatchNorm

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 16, 8) * 2 + 1, jnp.float32)
    ref_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    pk_bn = PackedBatchNorm(channels=8, f=2)
    v_ref = ref_bn.init(jax.random.PRNGKey(0), x,
                        use_running_average=False)
    v_pk = pk_bn.init(jax.random.PRNGKey(0), wpack(x, 2),
                      use_running_average=False)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_pk))

    # train mode: same normalized output, same updated running stats
    y_ref, m_ref = ref_bn.apply(v_ref, x, use_running_average=False,
                                mutable=["batch_stats"])
    y_pk, m_pk = pk_bn.apply(v_ref, wpack(x, 2),
                             use_running_average=False,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(wunpack(y_pk, 2)),
                               np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    for kname in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_pk["batch_stats"][kname]),
            np.asarray(m_ref["batch_stats"][kname]),
            rtol=1e-5, atol=1e-6)

    # eval mode against nontrivial running stats
    v2 = {"params": v_ref["params"],
          "batch_stats": {"mean": jnp.asarray(rng.randn(8),
                                              jnp.float32),
                          "var": jnp.asarray(rng.rand(8) + 0.5,
                                             jnp.float32)}}
    y_ref = ref_bn.apply(v2, x, use_running_average=True)
    y_pk = pk_bn.apply(v2, wpack(x, 2), use_running_average=True)
    np.testing.assert_allclose(np.asarray(wunpack(y_pk, 2)),
                               np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_wpack_encoder_model_parity():
    """ResnetEncoder(wpack_stem=True): same parameter tree, features,
    input gradients, and train-mode batch_stats as the naive encoder."""
    from depthmodelhardening_tpu.models.resnet import ResnetEncoder

    H, W = 32, 48
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, H, W, 3))
    naive = ResnetEncoder(num_layers=18)
    wp = ResnetEncoder(num_layers=18, wpack_stem=True)
    v = naive.init(jax.random.PRNGKey(1), x, train=False)
    v2 = wp.init(jax.random.PRNGKey(1), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    def outs_and_grad(model):
        # one trace per model: features + input gradient together
        def loss(x):
            feats = model.apply(v, x, train=False)
            return sum(jnp.sum(jnp.sin(f)) for f in feats), feats

        (_, feats), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(x)
        return feats, g

    f_ref, g_ref = outs_and_grad(naive)
    f_wp, g_wp = outs_and_grad(wp)
    for a, b in zip(f_ref, f_wp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_wp), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)

    # train mode: identical batch_stats updates through stem + layer1
    _, m_ref = naive.apply(v, x, train=True, mutable=["batch_stats"])
    _, m_wp = wp.apply(v, x, train=True, mutable=["batch_stats"])
    flat_ref = jax.tree_util.tree_leaves_with_path(m_ref)
    flat_wp = {jax.tree_util.keystr(p): l for p, l
               in jax.tree_util.tree_leaves_with_path(m_wp)}
    for p, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_wp[jax.tree_util.keystr(p)]),
            np.asarray(leaf), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(p))


def test_fused_maxpool_matches_autodiff_path():
    """wpack_maxpool3x3s2_fused: fwd bit-equal to wpack_maxpool3x3s2,
    bwd equal on continuous inputs (ties are measure-zero there)."""
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        wpack_maxpool3x3s2, wpack_maxpool3x3s2_fused,
    )

    k = jax.random.PRNGKey(3)
    xp = jax.random.normal(k, (2, 16, 12, 128), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(wpack_maxpool3x3s2_fused(xp, 64)),
        np.asarray(wpack_maxpool3x3s2(xp)))
    g = jax.random.normal(jax.random.fold_in(k, 1), (2, 8, 12, 64))
    g0 = jax.grad(lambda x: jnp.sum(wpack_maxpool3x3s2(x) * g))(xp)
    g1 = jax.grad(
        lambda x: jnp.sum(wpack_maxpool3x3s2_fused(x, 64) * g))(xp)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))


def test_fused_maxpool_tie_duplication_semantics():
    """On bit-equal ties the fused backward routes the FULL cotangent
    to every tied input (duplicating mass — the documented semantics,
    NOT a convex-combination subgradient). Pin it: an all-equal input
    makes every tap a winner, so each input entry receives the sum of
    the cotangents of all output windows covering it."""
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        wpack_maxpool3x3s2_fused,
    )

    C = 64
    xp = jnp.zeros((1, 4, 4, 2 * C), jnp.float32)  # all tied
    g = jnp.ones((1, 2, 4, C), jnp.float32)
    gx = jax.grad(
        lambda x: jnp.sum(wpack_maxpool3x3s2_fused(x, C) * g))(xp)
    gx = np.asarray(gx)
    # row coverage of input row r (pad 1, stride 2, H=4 -> Ho=2):
    # r=0: o=0 only; r=1: o=0,1; r=2: o=1; r=3: o=1 — counts 1,2,1,1.
    row_cover = np.array([1.0, 2.0, 1.0, 1.0])
    # width taps: p0[m] tops window m (1 window); p1[m] tops windows m
    # and m+1 (the shifted tap), except the last column (no m+1).
    p0_cover = np.ones(4)
    p1_cover = np.array([2.0, 2.0, 2.0, 1.0])
    exp = np.empty((1, 4, 4, 2 * C), np.float32)
    exp[0, :, :, :C] = (row_cover[:, None] * p0_cover[None, :])[..., None]
    exp[0, :, :, C:] = (row_cover[:, None] * p1_cover[None, :])[..., None]
    np.testing.assert_array_equal(gx, exp)


def test_rowfirst_maxpool_matches_width_first():
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        wpack_maxpool3x3s2, wpack_maxpool3x3s2_rowfirst,
    )

    k = jax.random.PRNGKey(4)
    xp = jax.random.normal(k, (2, 16, 12, 128), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(wpack_maxpool3x3s2_rowfirst(xp, 64)),
        np.asarray(wpack_maxpool3x3s2(xp)))


def test_rowslice_maxpool_matches_width_first():
    """The slice-max row chain (the same chain wpack4_maxpool3x3s2
    ships in the stem8 path — no reduce_window, no SelectAndScatter
    backward) matches the reference pool in values and in input
    gradients away from ties."""
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        wpack_maxpool3x3s2, wpack_maxpool3x3s2_rowslice,
    )

    k = jax.random.PRNGKey(6)
    xp = jax.random.normal(k, (2, 16, 12, 128), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(wpack_maxpool3x3s2_rowslice(xp, 64)),
        np.asarray(wpack_maxpool3x3s2(xp)))
    # continuous inputs: ties are measure-zero, grads must agree
    g_new = jax.grad(lambda x: jnp.sum(
        wpack_maxpool3x3s2_rowslice(x, 64) ** 2))(xp)
    g_ref = jax.grad(lambda x: jnp.sum(
        wpack_maxpool3x3s2(x) ** 2))(xp)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=0, atol=0)


def test_phases_maxpool_matches_width_first():
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        interleave_rows, phases_maxpool3x3s2, wpack_maxpool3x3s2,
    )

    k = jax.random.PRNGKey(5)
    y0 = jax.random.normal(k, (2, 8, 12, 128), jnp.float32)
    y1 = jax.random.normal(jax.random.fold_in(k, 1), y0.shape)
    np.testing.assert_array_equal(
        np.asarray(phases_maxpool3x3s2(y0, y1, 64)),
        np.asarray(wpack_maxpool3x3s2(interleave_rows(y0, y1))))


def test_s2d8_stem_conv_matches_normalized_7x7_stride2():
    """The 4x8-s2d stem (full input lanes, normalization folded into
    the kernel's ones channel, f=4-packed output) matches
    conv7x7_s2_pad3((x-0.45)/0.225) in values and input grads."""
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        s2d8_stem_conv_dilated,
    )
    from depthmodelhardening_tpu.ops.wpack_decoder import wunpack

    k = jax.random.PRNGKey(7)
    x = jax.random.uniform(k, (2, 16, 24, 3), jnp.float32)
    K = 0.1 * jax.random.normal(jax.random.fold_in(k, 1),
                                (7, 7, 3, 64), jnp.float32)

    def ref(x):
        xn = (x - 0.45) / 0.225
        return jax.lax.conv_general_dilated(
            xn, K, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = wunpack(s2d8_stem_conv_dilated(x, K), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x)),
                               rtol=0, atol=1e-5)
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(x)
    g_new = jax.grad(lambda x: jnp.sum(
        wunpack(s2d8_stem_conv_dilated(x, K), 4) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=0, atol=3e-4)


def test_wpack4_maxpool_matches_reference_pool():
    """The f=4-consuming / f=2-emitting pool equals the width-first
    reference pool re-packed."""
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        wpack4_maxpool3x3s2, wpack_maxpool3x3s2,
    )
    from depthmodelhardening_tpu.ops.wpack_decoder import wpack, wunpack

    k = jax.random.PRNGKey(8)
    xp4 = jax.random.normal(k, (2, 16, 6, 256), jnp.float32)
    got = wpack4_maxpool3x3s2(xp4, 64)
    ref = wpack(wpack_maxpool3x3s2(wpack(wunpack(xp4, 4), 2)), 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow  # heaviest parity compile (VERDICT r4 #6: keep the fast suite ~5 min); a lighter same-area case stays fast
def test_wpack_stem8_model_parity():
    """Full-model parity: wpack_stem8 + packed f=4 skip vs the naive
    model — same parameter tree, same disp (values/input grads), same
    train-mode batch stats."""
    import jax.tree_util as jtu

    from depthmodelhardening_tpu.models.wrappers import init_monodepth2

    k = jax.random.PRNGKey(9)
    m0, v0 = init_monodepth2(k, 32, 64, scales=(0,))
    # eval baseline: fold_bn-only (the already-tested fold rewrite is
    # the dominant rounding source; stem8 itself adds ~5e-6)
    mf, _ = init_monodepth2(k, 32, 64, scales=(0,), fold_bn=True)
    m8, v8 = init_monodepth2(k, 32, 64, scales=(0,), wpack_stem8=True,
                             wpack_decoder=True, fold_bn=True)
    assert jtu.tree_structure(v0) == jtu.tree_structure(v8)
    x = jax.random.uniform(jax.random.fold_in(k, 2), (2, 32, 64, 3),
                           jnp.float32)
    d0 = mf.apply(v0, x, train=False)
    d8 = m8.apply(v0, x, train=False)
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d0),
                               rtol=0, atol=2e-6)
    g0 = jax.grad(lambda x: jnp.sum(mf.apply(v0, x, train=False) ** 2))(x)
    g8 = jax.grad(lambda x: jnp.sum(m8.apply(v0, x, train=False) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g0),
                               rtol=0, atol=2e-5)
    out0, mut0 = m0.apply(v0, x, train=True, mutable=["batch_stats"])
    out8, mut8 = m8.apply(v0, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out0),
                               rtol=0, atol=2e-6)
    for a, b in zip(jtu.tree_leaves(mut0), jtu.tree_leaves(mut8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-5)


def test_s2d4_stem_conv_dilated_matches_7x7_stride2():
    """The lhs-dilated single-conv stem (rows emitted interleaved)
    matches the 7x7/s2 reference conv and the phase formulation,
    values and input grads."""
    from depthmodelhardening_tpu.ops.wpack_encoder import (
        interleave_rows, s2d4_stem_conv_dilated, s2d4_stem_conv_phases,
    )

    rng = np.random.RandomState(3)
    for (H, W, Cin) in ((16, 24, 3), (12, 16, 6), (8, 8, 3)):
        x = jnp.asarray(rng.randn(2, H, W, Cin), jnp.float32)
        k = jnp.asarray(rng.randn(7, 7, Cin, 64), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = wunpack(s2d4_stem_conv_dilated(x, k), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        ph = interleave_rows(*s2d4_stem_conv_phases(x, k))
        np.testing.assert_allclose(
            np.asarray(wunpack(ph, 2)), np.asarray(got),
            rtol=2e-5, atol=2e-5)

        gr = jax.grad(lambda x: jnp.sum(jnp.sin(
            jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))))(x)
        gg = jax.grad(lambda x: jnp.sum(jnp.sin(
            wunpack(s2d4_stem_conv_dilated(x, k), 2))))(x)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)
