"""DepthHints proxy-supervised losses.

Re-design of the depth-hints trainer deltas
(DepthNetworks/depth-hints/trainer.py:505-741):

  * a depth-hint warped stereo image is generated at scale 0 by
    reprojecting through the precomputed hint depth (:513-524);
  * its reprojection loss (+1000 on invalid hint pixels, :634-635)
    competes in a per-pixel argmin with the min-reprojection loss and
    the min-identity (automask) loss; the hint supervises only where it
    wins (compute_loss_masks :556-591);
  * the proxy loss is log(|depth - hint| + 1) on winning valid pixels,
    normalized by the number of winners (:715-723);
  * reprojection loss is masked-mean over non-automask pixels (:706-708)
    — depth-hints computes per-frame minima *before* the automask
    concat, unlike Monodepth2's all-at-once min (:670-696);
  * contras_loss_wt is 0.1 here (trainer.py:617) — set in
    HardeningConfig, not in this function.

Batch layout matches training/selfsup.py plus:
  batch["depth_hint"]      : (B, H, W, 1) fused-SGBM depth (0 invalid)
  batch["depth_hint_mask"] : (B, H, W, 1) validity mask
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import disp_to_depth, reproject_coords
from ..ops.losses import reprojection_loss, smooth_loss
from ..ops.resize import bilinear_resize
from ..ops.sampling import grid_sample
from .config import SelfSupConfig
from .selfsup import generate_images_pred


def depth_hint_warp(batch, cfg: SelfSupConfig):
    """Warp the stereo frame through the hint depth
    (trainer.py:513-524). Returns the warped image (B, H, W, 3)."""
    grid = reproject_coords(batch["depth_hint"], batch["inv_K"],
                            batch["K"], batch["stereo_T"])
    return grid_sample(batch["color"]["s"], grid, padding_mode="border",
                       align_corners=True)


def compute_depth_hints_losses(disps, batch, poses, rng,
                               cfg: SelfSupConfig,
                               use_depth_hints: bool = True):
    """Total self-supervised + proxy-hint loss, averaged over scales."""
    preds, depths = generate_images_pred(disps, batch, poses, cfg)
    target = batch["color"]["0"]
    use_ssim = not cfg.no_ssim

    hint_reproj = None
    if use_depth_hints:
        hint_pred = depth_hint_warp(batch, cfg)
        hint_reproj = reprojection_loss(hint_pred, target,
                                        use_ssim=use_ssim)
        hint_reproj = hint_reproj + 1000.0 * \
            (1.0 - batch["depth_hint_mask"])

    identity = None
    if not cfg.disable_automasking:
        ident = jnp.concatenate(
            [reprojection_loss(batch["color"][fid], target,
                               use_ssim=use_ssim)
             for fid in cfg.source_frame_ids], axis=-1)
        # min-as-you-go (trainer.py:670-672), then tie-break noise
        identity = jnp.min(ident, axis=-1, keepdims=True)
        identity = identity + jax.random.normal(
            rng, identity.shape, identity.dtype) * 1e-5

    aux = {"depth": depths[cfg.scales[0]]}
    total = 0.0
    for scale in cfg.scales:
        reproj = jnp.min(jnp.concatenate(
            [reprojection_loss(preds[(fid, scale)], target,
                               use_ssim=use_ssim)
             for fid in cfg.source_frame_ids], axis=-1),
            axis=-1, keepdims=True)

        # 3-way argmin masks (compute_loss_masks, trainer.py:556-591)
        stack = [reproj]
        if identity is not None:
            stack.append(identity)
        if hint_reproj is not None:
            stack.append(hint_reproj)
        if len(stack) > 1:
            all_losses = jnp.concatenate(stack, axis=-1)
            idxs = jnp.argmin(all_losses, axis=-1, keepdims=True)
            if identity is not None:
                reproj_mask = (idxs != 1).astype(reproj.dtype)
                hint_mask = (idxs == 2).astype(reproj.dtype) \
                    if hint_reproj is not None else None
            else:
                reproj_mask = jnp.ones_like(reproj)
                hint_mask = (idxs == 1).astype(reproj.dtype)
        else:
            reproj_mask = jnp.ones_like(reproj)
            hint_mask = None

        loss = jnp.sum(reproj * reproj_mask) / \
            (jnp.sum(reproj_mask) + 1e-7)

        if use_depth_hints and hint_mask is not None:
            pred_depth = depths[scale]
            hint_loss = jnp.log(jnp.abs(batch["depth_hint"] -
                                        pred_depth) + 1.0) * \
                batch["depth_hint_mask"] * hint_mask
            loss = loss + jnp.sum(hint_loss) / \
                (jnp.sum(hint_mask) + 1e-7)

        disp = disps[scale]
        color = bilinear_resize(target, disp.shape[1], disp.shape[2]) \
            if disp.shape[1:3] != target.shape[1:3] else target
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        loss = loss + cfg.disparity_smoothness * smooth_loss(
            disp / (mean_disp + 1e-7), color) / (2 ** scale)

        aux[f"loss/{scale}"] = loss
        total = total + loss

    total = total / len(cfg.scales)
    aux["selfsup_loss"] = total
    return total, aux
