"""ManyDepth cost-volume encoder (flax.linen, NHWC).

Re-design of ResnetEncoderMatching
(DepthNetworks/manydepth2/networks/resnet_encoder.py:112-331): ResNet
stages 0-1 extract 1/4-resolution features for the current and lookup
frames, a plane-sweep cost volume over 96 depth hypotheses (linear or
inverse binning, :133-155) is built by warping lookup features through
each hypothesised depth with the relative pose, L1-differenced, edge-
masked and averaged (:157-236); the confidence-masked volume is fused
back into the trunk by a 3x3 reduce conv and stages 2-4 complete the
pyramid (:300-307). Returns (features, lowest_cost disparity,
confidence_mask).

TPU-first differences from the reference (outputs identical):
  * the reference loops over batch items and lookup frames in Python
    with per-item grid_samples (:166-232); here the sweep is one
    vmap(batch) x vmap(frames) computation with the depth-bin axis
    folded into the sampler batch, so XLA sees a single fused gather;
  * warp depths are constructed on the fly from (traced) min/max bins —
    adaptive_bins needs no buffer rebuild;
  * lookup feature extraction is wrapped in stop_gradient (the
    reference's torch.no_grad, :275).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import backproject_depth, project_3d
from ..ops.sampling import grid_sample
from .resnet import _bn, run_stage


class ResnetEncoderMatching(nn.Module):
    num_layers: int = 18
    input_height: int = 192
    input_width: int = 640
    min_depth_bin: float = 0.1
    max_depth_bin: float = 20.0
    num_depth_bins: int = 96
    adaptive_bins: bool = False
    depth_binning: str = "linear"
    set_missing_to_max: bool = True
    dtype: Any = jnp.float32

    @property
    def matching_hw(self) -> Tuple[int, int]:
        return self.input_height // 4, self.input_width // 4

    # -- pieces ---------------------------------------------------------------
    def _stem(self, x, train):
        """layer0 + layer1 (resnet_encoder.py:104-105, 238-247)."""
        x = ((x - 0.45) / 0.225).astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn("bn1", self.dtype)(x, use_running_average=not train)
        f0 = nn.relu(x)
        x = nn.max_pool(f0, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        f1 = run_stage(x, 0, self.num_layers, self.dtype, train)
        return f0, f1

    def _depth_bins(self, min_bin, max_bin):
        """resnet_encoder.py:133-148; traced endpoints supported."""
        t = jnp.linspace(0.0, 1.0, self.num_depth_bins)
        if self.depth_binning == "inverse":
            inv = 1.0 / max_bin + (1.0 / min_bin - 1.0 / max_bin) * t
            return 1.0 / inv[::-1]
        if self.depth_binning == "linear":
            return min_bin + (max_bin - min_bin) * t
        raise NotImplementedError(self.depth_binning)

    def _cost_volume(self, current_feats, lookup_feats, poses, K, invK,
                     depth_bins):
        """Plane-sweep L1 cost volume (resnet_encoder.py:157-236).

        current_feats: (B, h, w, C); lookup_feats: (B, F, h, w, C);
        poses: (B, F, 4, 4); K/invK: (B, 4, 4) at matching resolution.
        Returns (cost_volume (B, D, h, w), missing_mask (B, D, h, w)).

        h, w come from the RUNTIME feature shape, not the module's
        static input size: the hardening attack runs the model on
        object-centered crops (round-5 fix — the static matching_hw
        broadcast a full-frame plane grid against crop features). At
        matched shapes this is identical; for crops the plane sweep
        runs at the crop's quarter resolution (values unchanged on
        the reference's zero-lookup path, where `present` zeroes
        every frame's diffs).
        """
        h, w = current_feats.shape[1:3]
        D = self.num_depth_bins
        warp_depths = jnp.broadcast_to(
            depth_bins.reshape(D, 1, 1, 1), (D, h, w, 1))

        def one_frame(cur, feat, pose, K1, invK1):
            # feat: (h, w, C); treat depth bins as the sampler batch
            K_d = jnp.broadcast_to(K1, (D, 4, 4))
            T_d = jnp.broadcast_to(pose, (D, 4, 4))
            pts = backproject_depth(warp_depths,
                                    jnp.broadcast_to(invK1, (D, 4, 4)))
            grid = project_3d(pts, K_d, T_d, h, w)
            warped = grid_sample(
                jnp.broadcast_to(feat, (D,) + feat.shape), grid,
                padding_mode="zeros", align_corners=True)

            xs = (grid[..., 0] / 2 + 0.5) * (w - 1)
            ys = (grid[..., 1] / 2 + 0.5) * (h - 1)
            edge = ((xs >= 2.0) & (xs <= w - 2) &
                    (ys >= 2.0) & (ys <= h - 2)).astype(cur.dtype)
            cur_mask = jnp.zeros((h, w), cur.dtype
                                 ).at[2:-2, 2:-2].set(1.0)
            edge = edge * cur_mask[None]

            diffs = jnp.mean(jnp.abs(warped - cur[None]), axis=-1) * edge
            # frames with an all-zero pose are missing (:190-191)
            present = (jnp.sum(jnp.abs(pose)) > 0).astype(cur.dtype)
            return diffs * present

        def one_item(cur, feats, item_poses, K1, invK1):
            diffs = jax.vmap(
                lambda f, p: one_frame(cur, f, p, K1, invK1)
            )(feats, item_poses)  # (F, D, h, w)
            counts = jnp.sum((diffs > 0).astype(cur.dtype), axis=0)
            cost = jnp.sum(diffs, axis=0) / (counts + 1e-7)
            missing = (cost == 0).astype(cur.dtype)
            if self.set_missing_to_max:
                cost = cost * (1 - missing) + \
                    jnp.max(cost, axis=0, keepdims=True) * missing
            return cost, missing

        return jax.vmap(one_item)(current_feats, lookup_feats, poses,
                                  K, invK)

    # -- forward ---------------------------------------------------------------
    @nn.compact
    def __call__(self, current_image, lookup_images, poses, K, invK,
                 min_depth_bin: Optional[Any] = None,
                 max_depth_bin: Optional[Any] = None,
                 train: bool = False, skip_cost_volume: bool = False):
        """current_image (B,H,W,3); lookup_images (B,F,H,W,3);
        poses (B,F,4,4); K/invK (B,4,4) at 1/4 resolution.
        Returns ([f0..f4], lowest_cost (B,h,w), confidence (B,h,w)).

        skip_cost_volume=True is the reference hardening mode's
        zero-lookup single-frame path (manydepth2/trainer.py:345-386)
        SHORT-CIRCUITED: with all-zero poses every frame is 'missing'
        (resnet_encoder.py:190-191), so the cost volume is provably
        all-zeros, confidence all-zero, and lowest_cost 1/bins[0] —
        this path emits those constants directly instead of
        plane-sweeping 96 zero hypotheses (the sweep's broadcast of
        the lookup features across bins OOM'd HBM at bench scale:
        f32[32,1,96,20480,64] = 30 GB), and skips the lookup frames'
        stem pass whose features would be discarded. Exact vs the
        general path on zero lookups
        (tests/test_matching_encoder.py::test_skip_cost_volume_parity).
        """
        B, F = lookup_images.shape[:2]
        if skip_cost_volume:
            f0, f1 = self._stem(current_image, train)
        else:
            flat = lookup_images.reshape((B * F,)
                                         + lookup_images.shape[2:])
            # one stem pass over current + lookup frames (larger conv
            # batch for the MXU; flax modules instantiated once)
            all_f0, all_f1 = self._stem(
                jnp.concatenate([current_image, flat], axis=0), train)
            f0, f1 = all_f0[:B], all_f1[:B]
        # NOTE: the reference declares a prematching_conv but never uses
        # it (resnet_encoder.py:122 is dead code) — matching happens on
        # the raw 64-channel layer1 features. We declare it too so
        # checkpoint shapes stay interchangeable.
        prematch = nn.Conv(16, (1, 1), dtype=self.dtype,
                           name="prematching_conv")
        _ = prematch(f1[:1, :1, :1])
        cur = f1

        if min_depth_bin is None or not self.adaptive_bins:
            min_depth_bin = self.min_depth_bin
        if max_depth_bin is None or not self.adaptive_bins:
            max_depth_bin = self.max_depth_bin
        depth_bins = self._depth_bins(jnp.asarray(min_depth_bin,
                                                  jnp.float32),
                                      jnp.asarray(max_depth_bin,
                                                  jnp.float32))

        if skip_cost_volume:
            h, w = f1.shape[1:3]
            D = self.num_depth_bins
            cost_volume = jnp.zeros((B, D, h, w), jnp.float32)
            confidence = jnp.zeros((B, h, w), jnp.float32)
            lowest_cost = jnp.broadcast_to(1.0 / depth_bins[0],
                                           (B, h, w))
        else:
            # torch.no_grad on the lookup branch (:275)
            lf = jax.lax.stop_gradient(
                all_f1[B:].reshape((B, F) + f1.shape[1:]))
            cur32 = cur.astype(jnp.float32)
            cost_volume, missing = self._cost_volume(
                cur32, lf.astype(jnp.float32), poses, K, invK,
                depth_bins)
            cost_volume = jax.lax.stop_gradient(cost_volume)
            missing = jax.lax.stop_gradient(missing)

            confidence = (jnp.sum((cost_volume * (1 - missing) > 0)
                                  .astype(jnp.float32), axis=1)
                          == self.num_depth_bins).astype(jnp.float32)

            viz = jnp.where(cost_volume == 0, 100.0, cost_volume)
            argmin = jnp.argmin(viz, axis=1)  # (B, h, w)
            lowest_cost = 1.0 / depth_bins[argmin]

        masked_cv = cost_volume * confidence[:, None]
        # NHWC: volume joins the channel axis
        fused = jnp.concatenate(
            [f1, jnp.moveaxis(masked_cv, 1, -1).astype(self.dtype)],
            axis=-1)
        post = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                               dtype=self.dtype, name="reduce_conv")(fused))

        f2 = run_stage(post, 1, self.num_layers, self.dtype, train)
        f3 = run_stage(f2, 2, self.num_layers, self.dtype, train)
        f4 = run_stage(f3, 3, self.num_layers, self.dtype, train)
        return [f0, f1, f2, f3, f4], lowest_cost, confidence
