"""Self-supervised monodepth loss assembly.

Functional re-design of the reference trainer's generate_images_pred +
compute_reprojection_loss + compute_losses (monodepth2/trainer.py:472-673)
and predict_poses (trainer.py:377-433): a pure function of (disparities,
batch, poses, rng) suitable for jit/grad/pjit.

Batch layout (all NHWC, frame ids are strings so "s" can join "-1"/"1"):
  batch["color"][fid]    : (B, H, W, 3) target-resolution colors
  batch["color_aug"][fid]: (B, H, W, 3) augmented (model/pose inputs)
  batch["K"], batch["inv_K"]: (B, 4, 4) intrinsics at scale 0
  batch["stereo_T"]      : (B, 4, 4) (when "s" in frame_ids)

Only the non-v1_multiscale path computes color pyramids (for smoothness);
they are built on-device here rather than in DataLoader workers
(mono_dataset.py:119-144), keeping the whole step one XLA computation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.geometry import (
    disp_to_depth, reproject_coords, transformation_from_parameters,
)
from ..ops.losses import reprojection_loss, smooth_loss
from ..ops.resize import bilinear_resize
from ..ops.sampling import grid_sample, grid_sample_rows
from .config import SelfSupConfig


def _stereo_is_pure_x(T) -> bool:
    """Trace-time check that stereo_T is a rectified pure x-translation
    (identity rotation, zero y/z translation) — the condition under
    which the MXU row-resample warp below is exact. A traced stereo_T
    cannot be inspected; then the caller vouches via
    cfg.rectified_stereo (true for the built-in stereo_T/
    stereo_T_batch extrinsics). ADVICE r3: a custom rotated extrinsic
    must not silently take the row path."""
    if isinstance(T, jax.core.Tracer):
        return True
    import numpy as np

    Tn = np.asarray(T, np.float64).reshape(-1, 4, 4)
    return (np.allclose(Tn[:, :3, :3], np.eye(3), atol=1e-6)
            and np.allclose(Tn[:, 1:3, 3], 0.0, atol=1e-6))


def predict_poses(pose_encoder_apply, pose_decoder_apply, variables,
                  color_aug: Dict[str, jnp.ndarray], cfg: SelfSupConfig,
                  train: bool = False):
    """Pose for each temporal source frame (trainer.py:377-433,
    "separate_resnet" two-frame variant).

    Pairs are ordered temporally ([f, 0] for f<0, [0, f] for f>0) and the
    resulting transform is inverted for f<0, so cam_T_cam always maps
    target-frame points into the source camera.

    variables: {"pose_encoder": vars, "pose_decoder": vars}.
    Returns {fid: (B, 4, 4)}.
    """
    out = {}
    for fid in cfg.temporal_source_ids:
        f = int(fid)
        if f < 0:
            pair = jnp.concatenate([color_aug[fid], color_aug["0"]], axis=-1)
        else:
            pair = jnp.concatenate([color_aug["0"], color_aug[fid]], axis=-1)
        feats = pose_encoder_apply(variables["pose_encoder"], pair,
                                   train=train)
        axisangle, translation = pose_decoder_apply(
            variables["pose_decoder"], [feats])
        out[fid] = transformation_from_parameters(
            axisangle[:, 0], translation[:, 0], invert=(f < 0))
    return out


def generate_images_pred(disps, batch, poses, cfg: SelfSupConfig):
    """Warp each source frame into the target view per scale
    (trainer.py:472-523). Returns ({(fid, scale): pred}, {scale: depth}).
    """
    H, W = cfg.height, cfg.width
    preds = {}
    depths = {}
    for scale in cfg.scales:
        disp = disps[scale]
        if not cfg.v1_multiscale:
            disp = bilinear_resize(disp, H, W)
        _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        depths[scale] = depth
        for fid in cfg.source_frame_ids:
            T = batch["stereo_T"] if fid == "s" else poses[fid]
            if fid == "s" and cfg.rectified_stereo \
                    and _stereo_is_pure_x(T):
                # Rectified stereo: stereo_T is a pure x-translation
                # (mono_dataset.py:112-117 / adv_synth baseline), so
                # the projected y equals the pixel y exactly and the
                # warp is a 1-D horizontal resample — the MXU one-hot
                # contraction replaces the element-wise gather that
                # dominated the full hardening step (~30x,
                # ops/sampling.py:bilinear_sample_rows). The sample
                # column is CLOSED-FORM: with R = I, t = (tx, 0, 0),
                # K·inv_K = I collapses backproject->transform->
                # project (layers.py:163-198) to
                #   sx = (x·depth + K[0,0]·tx) / (depth + eps)
                # — same values including the reference's +eps
                # z-division guard, without the (B,4,H·W) einsum
                # chain or the [-1,1] normalize/unnormalize
                # round-trip (~20 ms of geometry per config-4 step).
                from ..ops.sampling import bilinear_sample_rows

                d = depth[..., 0]
                xs = jnp.arange(W, dtype=d.dtype)
                fxtx = (batch["K"][:, 0, 0]
                        * T[:, 0, 3])[:, None, None].astype(d.dtype)
                sx = (xs * d + fxtx) / (d + 1e-7)
                preds[(fid, scale)] = bilinear_sample_rows(
                    batch["color"][fid], sx)
            else:
                grid = reproject_coords(depth, batch["inv_K"],
                                        batch["K"], T)
                preds[(fid, scale)] = grid_sample(
                    batch["color"][fid], grid, padding_mode="border",
                    align_corners=True)
    return preds, depths


def compute_selfsup_losses(disps, batch, poses, rng, cfg: SelfSupConfig):
    """Min-reprojection + automask + smoothness loss (trainer.py:588-673).

    disps: {scale: (B, h_s, w_s, 1)} raw sigmoid disparities.
    Returns (total_loss, aux) where aux carries per-scale losses, the
    scale-0 depth, and the warp predictions (for logging/eval parity).
    """
    preds, depths = generate_images_pred(disps, batch, poses, cfg)
    target = batch["color"]["0"]

    # Identity reprojection (automask) is scale-independent: compute once.
    identity = None
    if not cfg.disable_automasking:
        ident = [reprojection_loss(batch["color"][fid], target,
                                   use_ssim=not cfg.no_ssim)
                 for fid in cfg.source_frame_ids]
        identity = jnp.concatenate(ident, axis=-1)
        if cfg.avg_reprojection:
            identity = jnp.mean(identity, axis=-1, keepdims=True)
        # break ties against the warped losses (trainer.py:646-648)
        identity = identity + jax.random.normal(
            rng, identity.shape, identity.dtype) * 1e-5

    aux = {"depth": depths[cfg.scales[0]]}
    total = 0.0
    for scale in cfg.scales:
        reproj = jnp.concatenate(
            [reprojection_loss(preds[(fid, scale)], target,
                               use_ssim=not cfg.no_ssim)
             for fid in cfg.source_frame_ids], axis=-1)
        if cfg.avg_reprojection:
            reproj = jnp.mean(reproj, axis=-1, keepdims=True)
        combined = reproj if identity is None else jnp.concatenate(
            [identity, reproj], axis=-1)
        to_optimise = jnp.min(combined, axis=-1)
        loss = jnp.mean(to_optimise)

        disp = disps[scale]
        color = bilinear_resize(target, disp.shape[1], disp.shape[2]) \
            if disp.shape[1:3] != target.shape[1:3] else target
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        norm_disp = disp / (mean_disp + 1e-7)
        loss = loss + cfg.disparity_smoothness * \
            smooth_loss(norm_disp, color) / (2 ** scale)

        aux[f"loss/{scale}"] = loss
        total = total + loss

    total = total / len(cfg.scales)
    aux["selfsup_loss"] = total
    return total, aux
