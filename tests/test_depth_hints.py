"""DepthHints: SGBM precompute fusion + proxy-supervised loss."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.data.depth_hints import (
    BASELINE, compute_candidate_depths, compute_depth_hint,
    load_depth_hint, precompute_for_split, scaled_K,
)
from depthmodelhardening_tpu.training.config import SelfSupConfig
from depthmodelhardening_tpu.training.depth_hints import (
    compute_depth_hints_losses, depth_hint_warp,
)
from depthmodelhardening_tpu.training.adv_synth import stereo_T_batch
from depthmodelhardening_tpu.training.hardening import _scaled_K

H, W = 96, 320


def _shifted_stereo_pair(disp_px: int = 8, h: int = H, w: int = W):
    """A textured left image and a right image shifted by disp_px (a
    fronto-parallel plane at depth f*B/disp)."""
    rs = np.random.RandomState(0)
    base = rs.randint(0, 255, (h, w + disp_px, 3), np.uint8)
    # smooth a bit so SGBM can match
    base = (base.astype(np.float32) + np.roll(base, 1, 1) +
            np.roll(base, 1, 0)).astype(np.float32) / 3.0
    base = base.astype(np.uint8)
    # positive left-image disparity: right-eye content shifts left
    left = base[:, :-disp_px]
    right = base[:, disp_px:]
    return left, right


def test_sgbm_candidates_recover_plane_depth():
    left, right = _shifted_stereo_pair(8)
    K, _ = scaled_K(H, W)
    depths = compute_candidate_depths(left, right, focal=float(K[0, 0]))
    assert depths.shape[0] == 12
    expected = float(K[0, 0]) * BASELINE / 8.0
    valid = depths[depths > 0]
    assert valid.size > 0
    med = np.median(valid)
    assert abs(med - expected) / expected < 0.25


def test_fused_hint_and_roundtrip(tmp_path):
    left, right = _shifted_stereo_pair(8)
    hint = compute_depth_hint(left, right, side="l", height=H, width=W)
    assert hint.shape == (H, W)
    K, _ = scaled_K(H, W)
    expected = float(K[0, 0]) * BASELINE / 8.0
    valid = hint[hint > 0]
    assert abs(np.median(valid) - expected) / expected < 0.25


def test_precompute_for_split(tmp_path):
    from PIL import Image

    left, right = _shifted_stereo_pair(8, 64, 256)
    seq = "2011_09_26/2011_09_26_drive_0001_sync"
    for cam, img in (("image_02", left), ("image_03", right)):
        d = tmp_path / seq / cam / "data"
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(str(d / "0000000005.png"))
    written = precompute_for_split(str(tmp_path), [f"{seq} 5 l"],
                                   height=64, width=256)
    assert len(written) == 1
    hint = load_depth_hint(str(tmp_path / "depth_hints"), seq, 5, "l")
    assert hint.shape == (64, 256)
    flipped = load_depth_hint(str(tmp_path / "depth_hints"), seq, 5,
                              "l", do_flip=True)
    np.testing.assert_allclose(flipped, hint[:, ::-1])


def _hint_batch(B=2):
    cfg = SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    target = jax.random.uniform(k1, (B, H, W, 3))
    other = jax.random.uniform(k2, (B, H, W, 3))
    K, inv_K = _scaled_K(H, W)
    side = jnp.ones((B,), bool)
    flip = jnp.zeros((B,), bool)
    batch = {
        "color": {"0": target, "s": other},
        "color_aug": {"0": target, "s": other},
        "K": jnp.broadcast_to(jnp.asarray(K), (B, 4, 4)),
        "inv_K": jnp.broadcast_to(jnp.asarray(inv_K), (B, 4, 4)),
        "stereo_T": stereo_T_batch(side, flip),
        "depth_hint": jax.random.uniform(k3, (B, H, W, 1),
                                         minval=2.0, maxval=30.0),
        "depth_hint_mask": jnp.ones((B, H, W, 1)),
    }
    return cfg, batch


@pytest.mark.slow
def test_depth_hints_loss_finite_and_grad():
    cfg, batch = _hint_batch()
    disps = {s: jnp.full((2, H // 2 ** s, W // 2 ** s, 1), 0.3)
             for s in cfg.scales}

    def f(d):
        loss, _ = compute_depth_hints_losses(
            d, batch, {}, jax.random.PRNGKey(1), cfg)
        return loss

    loss = f(disps)
    assert np.isfinite(float(loss))
    g = jax.grad(f)(disps)
    for s in cfg.scales:
        assert np.all(np.isfinite(np.asarray(g[s])))


def test_depth_hint_warp_shape():
    cfg, batch = _hint_batch()
    warped = depth_hint_warp(batch, cfg)
    assert warped.shape == (2, H, W, 3)


def test_invalid_hints_never_win():
    """With depth_hint_mask == 0 the +1000 penalty keeps the hint branch
    out of the argmin, so the loss must equal the no-hints path."""
    cfg, batch = _hint_batch()
    batch["depth_hint_mask"] = jnp.zeros_like(batch["depth_hint_mask"])
    disps = {s: jnp.full((2, H // 2 ** s, W // 2 ** s, 1), 0.3)
             for s in cfg.scales}
    with_hints, _ = compute_depth_hints_losses(
        disps, batch, {}, jax.random.PRNGKey(1), cfg)
    without, _ = compute_depth_hints_losses(
        disps, batch, {}, jax.random.PRNGKey(1), cfg,
        use_depth_hints=False)
    np.testing.assert_allclose(float(with_hints), float(without),
                               rtol=1e-6)
