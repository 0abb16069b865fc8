"""Clean KITTI eigen-split depth evaluation.

Re-design of evaluate_depth.py:245-395 `evaluate()`:
  * predict disparity at the working resolution for each test frame,
    optionally averaging with the horizontally flipped prediction via
    the side-masked post-process (batch_post_process_disparity,
    evaluate_depth.py:102-110);
  * compare against gt_depths (from export_gt_depth.py / velodyne) with
    the eigen crop (rows 0.40810811..0.99189189, cols
    0.03594771..0.96405229 of the native frame, :363-367);
  * median scaling per frame unless stereo training (then fixed x5.4,
    :340-344), clamp to [1e-3, 80];
  * report the mean 7-tuple (abs_rel, sq_rel, rmse, rmse_log, a1,a2,a3).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import compute_depth_errors
from ..ops.resize import bilinear_resize

CLEAN_METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log",
                      "a1", "a2", "a3")


@dataclasses.dataclass(frozen=True)
class CleanEvalConfig:
    eval_stereo: bool = True  # fixed 5.4 scale vs median scaling
    min_depth: float = 1e-3
    max_depth: float = 80.0
    post_process: bool = False  # flip-average (evaluate_depth.py:280-291)
    disable_median_scaling: bool = False
    pred_depth_scale_factor: float = 1.0


STEREO_SCALE_FACTOR = 5.4


def batch_post_process_disparity(l_disp: np.ndarray,
                                 r_disp: np.ndarray) -> np.ndarray:
    """Flip-averaging with smooth side masks (evaluate_depth.py:102-110;
    from Monodepth v1). l_disp/r_disp: (B, H, W)."""
    _, h, w = l_disp.shape
    m_disp = 0.5 * (l_disp + r_disp)
    l_grid, _ = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h),
                            indexing="xy")
    l_mask = (1.0 - np.clip(20 * (l_grid - 0.05), 0, 1))[None, ...]
    r_mask = l_mask[:, :, ::-1]
    return r_mask * l_disp + l_mask * r_disp + \
        (1.0 - l_mask - r_mask) * m_disp


def eigen_crop_mask(gt_height: int, gt_width: int) -> np.ndarray:
    """Eigen evaluation crop at native resolution
    (evaluate_depth.py:363-367)."""
    crop = np.array([0.40810811 * gt_height, 0.99189189 * gt_height,
                     0.03594771 * gt_width, 0.96405229 * gt_width]
                    ).astype(np.int32)
    mask = np.zeros((gt_height, gt_width), bool)
    mask[crop[0]:crop[1], crop[2]:crop[3]] = True
    return mask


def disp_to_scaled_depth(disp: np.ndarray) -> np.ndarray:
    """disp (working res, [0,1] sigmoid output) -> 1/depth per the eval
    convention (evaluate_depth.py:306-311: depth = 1 / resized disp,
    using disp_to_depth's scaled disparity)."""
    min_disp, max_disp = 1.0 / 100.0, 1.0 / 0.1
    return min_disp + (max_disp - min_disp) * disp


def evaluate_clean(predictor, frames_and_gts: Iterable[Tuple[np.ndarray,
                                                             np.ndarray]],
                   cfg: CleanEvalConfig = CleanEvalConfig(),
                   batched_predict=None):
    """frames_and_gts yields (image (H,W,3) at working resolution,
    gt_depth (gt_h, gt_w) at native resolution).

    Returns ({metric: mean}, ratios) where ratios are the per-frame
    median scale factors (empty when stereo scaling is used).
    """
    errors = []
    ratios = []
    predict = batched_predict or (
        lambda imgs: predictor(jnp.asarray(imgs)))

    for img, gt in frames_and_gts:
        disp = np.asarray(predict(img[None]))[0, ..., 0]
        if cfg.post_process:
            disp_f = np.asarray(predict(img[None, :, ::-1]))[0, ..., 0]
            disp = batch_post_process_disparity(
                disp[None], disp_f[None, :, ::-1])[0]

        gt_h, gt_w = gt.shape
        scaled = disp_to_scaled_depth(disp)[None, ..., None]
        pred_disp = np.asarray(
            bilinear_resize(jnp.asarray(scaled), gt_h, gt_w))[0, ..., 0]
        pred_depth = 1.0 / pred_disp

        # valid-depth bounds + eigen crop (evaluate_depth.py:360-367:
        # mask = (gt > MIN_DEPTH) & (gt < MAX_DEPTH) & crop)
        mask = ((gt > cfg.min_depth) & (gt < cfg.max_depth) &
                eigen_crop_mask(gt_h, gt_w))
        pred = pred_depth[mask]
        gt_m = gt[mask]

        pred *= cfg.pred_depth_scale_factor
        if cfg.eval_stereo:
            pred *= STEREO_SCALE_FACTOR  # evaluate_depth.py:340-344
        elif not cfg.disable_median_scaling:
            ratio = np.median(gt_m) / np.median(pred)
            ratios.append(ratio)
            pred *= ratio

        pred = np.clip(pred, cfg.min_depth, cfg.max_depth)
        errors.append([float(x) for x in compute_depth_errors(
            jnp.asarray(gt_m), jnp.asarray(pred))])

    mean_errors = np.asarray(errors).mean(axis=0)
    return dict(zip(CLEAN_METRIC_NAMES, mean_errors.tolist())), ratios
