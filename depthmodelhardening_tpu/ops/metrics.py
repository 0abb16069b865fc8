"""Depth-error metrics matching both reference variants.

  * compute_depth_errors — 7-tuple torch variant used during training
    monitoring (DepthNetworks/monodepth2/layers.py:256-274).
  * compute_errors_masked — 8-tuple (abs_err first) numpy variant with
    optional object-mask weighting used by the attack evaluator
    (DepthNetworks/monodepth2/evaluate_depth.py:57-99).
  * get_mean_depth_diff — mean depth difference metric (my_utils.py:31-41):
    scaled depth (x5.4), clamp at 100, optional car mask.

All functions are pure jnp and jittable; evaluation drivers may call them
on device and only transfer the scalar tuples.
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import disp_to_depth

STEREO_SCALE_FACTOR = 5.4
MIN_DEPTH = 1e-3
MAX_DEPTH = 80.0


def compute_depth_errors(gt, pred):
    """7-tuple (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3).

    gt/pred: flat (already masked/selected) positive depth arrays.
    """
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25 ** 3).astype(jnp.float32))

    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def compute_errors_masked(gt, pred, mask=None):
    """8-tuple (abs_err, abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3).

    With mask: every statistic is a mask-weighted sum / mask.sum(), exactly
    as evaluate_depth.py:77-96 (pixels outside the mask contribute zero).
    """
    if mask is None:
        thresh = jnp.maximum(gt / pred, pred / gt)
        a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
        a2 = jnp.mean((thresh < 1.25 ** 2).astype(jnp.float32))
        a3 = jnp.mean((thresh < 1.25 ** 3).astype(jnp.float32))
        abs_err = jnp.mean(jnp.abs(gt - pred))
        rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
        rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
        abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
        sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    else:
        total = jnp.sum(mask)
        thresh = jnp.maximum(gt / pred, pred / gt)
        a1 = jnp.sum((thresh < 1.25) * mask) / total
        a2 = jnp.sum((thresh < 1.25 ** 2) * mask) / total
        a3 = jnp.sum((thresh < 1.25 ** 3) * mask) / total
        abs_err = jnp.sum(jnp.abs(gt - pred) * mask) / total
        rmse = jnp.sqrt(jnp.sum((gt - pred) ** 2 * mask) / total)
        rmse_log = jnp.sqrt(
            jnp.sum((jnp.log(gt) - jnp.log(pred)) ** 2 * mask) / total)
        abs_rel = jnp.sum(jnp.abs(gt - pred) / gt * mask) / total
        sq_rel = jnp.sum((gt - pred) ** 2 / gt * mask) / total
    return abs_err, abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def get_mean_depth_diff(adv_disp, ben_disp, scene_car_mask=None,
                        use_abs=False):
    """Mean depth difference between two disparity maps (my_utils.py:31-41).

    Depth = clamp(disp_to_depth(|disp|, 0.1, 100).depth * mask * 5.4, max=100);
    result = sum(d_adv - d_ben) / sum(mask) (abs() of the difference when
    use_abs).
    """
    scaler = STEREO_SCALE_FACTOR
    if scene_car_mask is None:
        scene_car_mask = jnp.ones_like(adv_disp)
    dep_adv = jnp.clip(
        disp_to_depth(jnp.abs(adv_disp), 0.1, 100)[1] * scene_car_mask * scaler,
        max=100.0)
    dep_ben = jnp.clip(
        disp_to_depth(jnp.abs(ben_disp), 0.1, 100)[1] * scene_car_mask * scaler,
        max=100.0)
    diff = dep_adv - dep_ben
    if use_abs:
        diff = jnp.abs(diff)
    return jnp.sum(diff) / jnp.sum(scene_car_mask)


def compute_depth_losses(depth_pred, depth_gt, ori_h: int = 375,
                         ori_w: int = 1242):
    """In-training depth-metric monitor (trainer.py:676-704): resize the
    predicted depth to native resolution, mask to velodyne-valid pixels
    inside the hard garg/eigen crop (rows 153:371, cols 44:1197),
    median-scale, clamp [1e-3, 80], and return the 7 metrics computed
    with zero-weighted invalid pixels (mask-weighted means — batch-mean
    like the reference, jit-friendly since the mask stays dense).

    depth_pred: (B, h, w, 1); depth_gt: (B, ori_h, ori_w, 1) with 0 at
    missing returns. Returns dict of scalars keyed like the reference's
    depth_metric_names ("de/abs_rel", ..., "da/a3").
    """
    from .resize import bilinear_resize

    pred = jnp.clip(bilinear_resize(depth_pred, ori_h, ori_w),
                    1e-3, 80.0)
    mask = (depth_gt > 0).astype(pred.dtype)
    crop = jnp.zeros((ori_h, ori_w), pred.dtype
                     ).at[153:371, 44:1197].set(1.0)
    mask = mask * crop[None, :, :, None]

    total = jnp.sum(mask)
    # median scaling on the masked values: use a large fill so invalid
    # pixels don't perturb the (approximate) masked median
    def masked_median(x):
        big = jnp.where(mask > 0, x, jnp.nan)
        return jnp.nanmedian(big)

    ratio = masked_median(depth_gt) / masked_median(pred)
    pred = jnp.clip(pred * ratio, 1e-3, 80.0)

    gt_s = jnp.where(mask > 0, depth_gt, 1.0)
    pr_s = jnp.where(mask > 0, pred, 1.0)
    abs_err, abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = \
        compute_errors_masked(gt_s, pr_s, mask)
    names = ("de/abs_rel", "de/sq_rel", "de/rms", "de/log_rms",
             "da/a1", "da/a2", "da/a3")
    vals = (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3)
    return dict(zip(names, vals))


def scaled_clamped_depth(disp, scale=STEREO_SCALE_FACTOR,
                         min_depth=MIN_DEPTH, max_depth=MAX_DEPTH):
    """Metric depth used by the attack evaluator (evaluate_depth.py:193-194):
    clamp(disp_to_depth(|disp|, 0.1, 100).depth * 5.4, 1e-3, 80)."""
    depth = disp_to_depth(jnp.abs(disp), 0.1, 100)[1] * scale
    return jnp.clip(depth, min_depth, max_depth)
