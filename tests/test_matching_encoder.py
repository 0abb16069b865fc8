"""Cost-volume (ManyDepth) encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.models.matching_encoder import (
    ResnetEncoderMatching,
)
from depthmodelhardening_tpu.models.wrappers import (
    ManyDepthModel, quarter_intrinsics,
)

H, W = 64, 96
D = 8


def _K_quarter():
    Kn = np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    return quarter_intrinsics(Kn, W, H)


@pytest.fixture(scope="module")
def enc_and_vars():
    enc = ResnetEncoderMatching(num_layers=18, input_height=H,
                                input_width=W, num_depth_bins=D)
    rng = jax.random.PRNGKey(0)
    cur = jax.random.uniform(rng, (2, H, W, 3))
    lookup = jnp.stack([cur, cur], axis=1)  # (B, 2, H, W, 3)
    poses = jnp.broadcast_to(jnp.eye(4), (2, 2, 4, 4))
    K, invK = _K_quarter()
    Kb = jnp.broadcast_to(K, (2, 4, 4))
    invKb = jnp.broadcast_to(invK, (2, 4, 4))
    variables = enc.init(rng, cur, lookup, poses, Kb, invKb,
                         train=False)
    return enc, variables, (cur, lookup, poses, Kb, invKb)


def test_matching_encoder_shapes(enc_and_vars):
    enc, variables, (cur, lookup, poses, Kb, invKb) = enc_and_vars
    feats, lowest_cost, confidence = enc.apply(
        variables, cur, lookup, poses, Kb, invKb, train=False)
    assert len(feats) == 5
    assert feats[0].shape == (2, H // 2, W // 2, 64)
    assert feats[1].shape == (2, H // 4, W // 4, 64)
    assert feats[4].shape == (2, H // 32, W // 32, 512)
    assert lowest_cost.shape == (2, H // 4, W // 4)
    assert confidence.shape == (2, H // 4, W // 4)
    assert set(np.unique(np.asarray(confidence))) <= {0.0, 1.0}
    assert np.isfinite(np.asarray(lowest_cost)).all()


def test_manydepth_crop_input_zero_lookup(enc_and_vars):
    """The hardening attack applies the ManyDepth model to
    object-centered CROPS: the zero-lookup single-frame path must
    accept inputs smaller than the module's static input size (the
    plane grid follows the runtime feature shape — round-5 fix) and
    the crop's cost volume stays all-missing (zero poses)."""
    enc, variables, _ = enc_and_vars
    Hc, Wc = H // 2, W - 32
    rng = jax.random.PRNGKey(4)
    cur = jax.random.uniform(rng, (2, Hc, Wc, 3))
    lookup = jnp.zeros((2, 1, Hc, Wc, 3))
    poses = jnp.zeros((2, 1, 4, 4))
    K, invK = _K_quarter()
    feats, lowest_cost, confidence = enc.apply(
        variables, cur, lookup, poses,
        jnp.broadcast_to(K, (2, 4, 4)),
        jnp.broadcast_to(invK, (2, 4, 4)), train=False)
    assert feats[1].shape == (2, Hc // 4, Wc // 4, 64)
    assert lowest_cost.shape == (2, Hc // 4, Wc // 4)
    # zero poses -> every frame missing -> zero confidence everywhere
    # (so the masked cost volume feeds zeros into reduce_conv, the
    # reference's single-frame behavior) and argmin falls to bin 0
    # (lowest_cost = 1 / min_depth_bin)
    assert float(jnp.max(confidence)) == 0.0
    np.testing.assert_allclose(np.asarray(lowest_cost), 10.0)


def test_skip_cost_volume_parity(enc_and_vars):
    """skip_cost_volume=True (the zero-lookup hardening path's
    short-circuit) must match the general path run on zero lookups /
    zero poses exactly — features, lowest_cost and confidence."""
    enc, variables, (cur, _, _, Kb, invKb) = enc_and_vars
    lookup = jnp.zeros((2, 1, H, W, 3))
    poses = jnp.zeros((2, 1, 4, 4))
    ref = enc.apply(variables, cur, lookup, poses, Kb, invKb,
                    train=False)
    fast = enc.apply(variables, cur, lookup, poses, Kb, invKb,
                     train=False, skip_cost_volume=True)
    for a, b in zip(ref[0], fast[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref[1]),
                                  np.asarray(fast[1]))
    np.testing.assert_array_equal(np.asarray(ref[2]),
                                  np.asarray(fast[2]))


def test_identity_pose_same_frame_zero_cost(enc_and_vars):
    """Lookup == current with identity pose: every depth hypothesis
    reprojects onto itself, so the interior cost is ~0 (up to the
    projection-eps interpolation noise the reference also has)."""
    enc, variables, (cur, lookup, poses, Kb, invKb) = enc_and_vars

    bins = enc._depth_bins(jnp.asarray(0.1), jnp.asarray(20.0))
    f = jax.random.uniform(jax.random.PRNGKey(1),
                           (1, H // 4, W // 4, 16))
    cost, missing = enc._cost_volume(f, f[:, None], poses[:1, :1],
                                     Kb[:1], invKb[:1], bins)
    assert cost.shape == (1, D, H // 4, W // 4)
    assert missing.shape == cost.shape
    inner = np.abs(np.asarray(cost))[0, :, 3:-3, 3:-3]
    assert inner.max() < 1e-3


def test_zero_pose_means_missing_frame(enc_and_vars):
    enc, variables, (cur, lookup, poses, Kb, invKb) = enc_and_vars
    zero_poses = jnp.zeros_like(poses)
    feats, lowest_cost, confidence = enc.apply(
        variables, cur, lookup, zero_poses, Kb, invKb, train=False)
    # no lookup contributes -> nothing observed -> zero confidence
    assert float(jnp.max(confidence)) == 0.0


@pytest.mark.slow
def test_manydepth_model_forward():
    model = ManyDepthModel(num_layers=18, input_height=H, input_width=W)
    K, invK = _K_quarter()
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    Kb = jnp.broadcast_to(K, (1, 4, 4))
    invKb = jnp.broadcast_to(invK, (1, 4, 4))
    variables = model.init(jax.random.PRNGKey(3), x, Kb, invKb)
    disp = model.apply(variables, x, Kb, invKb)
    assert disp.shape == (1, H, W, 1)
    # sigmoid/8.6437 bound
    assert float(disp.max()) <= 1.0 / 8.6437 + 1e-6
    assert np.isfinite(np.asarray(disp)).all()


def test_manydepth_multi_frame_forward():
    import numpy as np
    from depthmodelhardening_tpu.models.wrappers import ManyDepthModel

    H, W = 64, 96
    m = ManyDepthModel(input_height=H, input_width=W,
                       num_depth_bins=8)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (1, H, W, 3))
    lookup = x[:, None] * 0.9
    pose = jnp.eye(4)[None, None]
    pose = pose.at[:, :, 0, 3].set(0.1)  # small translation
    K = np.array([[0.58 * W // 4, 0, 0.5 * W // 4, 0],
                  [0, 1.92 * H // 4, 0.5 * H // 4, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    Kb = jnp.asarray(K)[None]
    invKb = jnp.asarray(np.linalg.pinv(K))[None]
    v = m.init(k, x, Kb, invKb)
    disp, lowest_cost, conf = m.apply(
        v, x, lookup, pose, Kb, invKb, method=ManyDepthModel.multi_frame)
    assert disp.shape == (1, H, W, 1)
    assert lowest_cost.shape[1:3] == (H // 4, W // 4)
    assert conf.shape[1:3] == (H // 4, W // 4)
    assert bool(jnp.all(jnp.isfinite(disp)))
    # real lookups must actually change the prediction vs zero lookups
    disp0 = m.apply(v, x, Kb, invKb)
    assert float(jnp.max(jnp.abs(disp - disp0))) > 0
