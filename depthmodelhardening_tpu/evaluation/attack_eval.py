"""Adversarial robustness evaluation.

Re-design of evaluate_attacks (DepthNetworks/monodepth2/
evaluate_depth.py:113-214): build an attack from a config dict, loop
eval_count scene batches of the KITTI-object val split starting at
start_idx 42, attack with eval=True (sample 0 pinned), and measure the
error of the *attacked* prediction against the *benign* prediction of
the same model inside the object mask, on stereo-scaled clamped depth
(x5.4, [1e-3, 80], evaluate_depth.py:193-197). Reports the mean and max
of [abs_err, abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3]
(:204-212).

The per-batch pipeline (attack inner loop + both forwards + masked
metrics) is one jitted computation; only the 8-tuple means leave the
device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import (
    ArbiObjectAttack, GaussianObjectAttack, L0ObjectAttack,
    L2ObjectAttack, LightObjectAttack, PGDImageAttack, PGDObjectAttack,
    PhysicalObjectAttack, PhysObjAttackConfig, VanilaObjectAttack,
)
from ..ops.metrics import compute_errors_masked, scaled_clamped_depth

METRIC_NAMES = ("abs_err", "abs_rel", "sq_rel", "rmse", "rmse_log",
                "a1", "a2", "a3")


@dataclasses.dataclass(frozen=True)
class AttackEvalConfig:
    """Mirror of the reference's eval attack-args dicts
    (evaluate_depth.py:403-517)."""

    norm_type: str = "l_0"  # l_inf | l_0 | image | l_2 | arbi |
    #                         guassian | light | vanila | physical
    epsilon: float = 0.1
    alpha: float = 0.005
    step: int = 10
    adam_lr: float = 0.5
    mask_wt: float = 0.05
    l0_thresh: float = 0.1
    batch_size: int = 12
    eval_count: int = 10
    start_idx: int = 42  # evaluate_depth.py:160
    n_inits: int = 200  # light attack
    n_neighbors: int = 20
    n_queries: int = 5000  # Square attack
    obj_name: str = "BMW"  # metric quad size key (physicalTrans.py:35-40)
    scene_h: int = 320
    scene_w: int = 1024
    ori_h: int = 375
    ori_w: int = 1242
    # directory for per-batch image dumps (attacked/benign scenes +
    # 6-panel disparity comparison, evaluate_depth_physical.py:124-165)
    dump_dir: Optional[str] = None


def build_attack(cfg: AttackEvalConfig, predict_fn, obj_img, obj_mask,
                 adv_obj_img=None):
    """Attack factory (evaluate_depth.py:119-151 dispatch)."""
    from ..physics.eot import VEHICLE_SIZES

    oh, ow = obj_img.shape[1:3]
    veh_h, veh_w = VEHICLE_SIZES.get(
        next((k for k in VEHICLE_SIZES if cfg.obj_name.startswith(k)),
             "BMW"))
    base = PhysObjAttackConfig(
        obj_h=oh, obj_w=ow, scene_h=cfg.scene_h, scene_w=cfg.scene_w,
        ori_h=cfg.ori_h, ori_w=cfg.ori_w, veh_h=veh_h, veh_w=veh_w,
        eval_pin_z0=6.1 if cfg.norm_type == "l_0" else 7.0)
    nt = cfg.norm_type
    if nt == "image":
        return PGDImageAttack(predict_fn, eps=cfg.epsilon,
                              alpha=cfg.alpha, steps=cfg.step,
                              scene_hw=(cfg.scene_h, cfg.scene_w))
    if nt == "l_inf":
        return PGDObjectAttack(predict_fn, obj_img, obj_mask, base,
                               eps=cfg.epsilon, alpha=cfg.alpha,
                               steps=cfg.step)
    if nt == "l_0":
        return L0ObjectAttack(predict_fn, obj_img, obj_mask, base,
                              adam_lr=cfg.adam_lr, steps=cfg.step,
                              mask_wt=cfg.mask_wt,
                              l0_thresh=cfg.l0_thresh)
    if nt == "l_2":
        return L2ObjectAttack(predict_fn, obj_img, obj_mask, base,
                              eps=cfg.epsilon, steps=cfg.step)
    if nt == "arbi":
        return ArbiObjectAttack(predict_fn, obj_img, obj_mask, base)
    if nt == "guassian":
        return GaussianObjectAttack(predict_fn, obj_img, obj_mask, base,
                                    steps=cfg.step)
    if nt == "light":
        return LightObjectAttack(predict_fn, obj_img, obj_mask, base,
                                 n_inits=cfg.n_inits,
                                 n_neighbors=cfg.n_neighbors)
    if nt == "vanila":
        return VanilaObjectAttack(predict_fn, obj_img, obj_mask, base)
    if nt == "physical":
        if adv_obj_img is None:
            raise ValueError("physical attack needs adv_obj_img")
        return PhysicalObjectAttack(predict_fn, obj_img, obj_mask,
                                    adv_obj_img, base)
    if nt == "APGD":
        from ..attacks.apgd_object import APGDObjectAttack

        return APGDObjectAttack(predict_fn, obj_img, obj_mask, base,
                                eps=cfg.epsilon, steps=cfg.step)
    if nt == "Square":
        from ..attacks.square_object import SquareObjectAttack

        return SquareObjectAttack(predict_fn, obj_img, obj_mask, base,
                                  eps=cfg.epsilon,
                                  n_queries=cfg.n_queries)
    raise ValueError(f"unknown norm_type {nt}")


def _batch_metrics(predictor, adv, ben, masks):
    disp_gt = predictor(ben)
    disp_atk = predictor(adv)
    d_gt = scaled_clamped_depth(disp_gt)
    d_atk = scaled_clamped_depth(disp_atk)
    return compute_errors_masked(d_gt, d_atk, masks)


def evaluate_attacks(predictor, attack, scenes_iter: Iterable,
                     cfg: AttackEvalConfig, rng=None,
                     vanila_obj=None,
                     metric_predictor=None) -> Dict[str, Dict[str, float]]:
    """Run the attack over eval batches and aggregate metrics.

    predictor: DepthPredictor (frozen) the attack optimizes against.
    metric_predictor: optional different model whose predictions are
      measured — the transferability cross-check
      (evaluate_depth_crosscheck.py:205-215 attacks the source model and
      evaluates the target model). Defaults to `predictor`.
    scenes_iter: yields (B, ori_h, ori_w, 3) scene batches (the caller
      applies start_idx/eval_count slicing, or use iter_eval_scenes).
    Returns {"mean": {...}, "max": {...}} keyed by METRIC_NAMES.
    """
    rng = jax.random.PRNGKey(17) if rng is None else rng
    metric_predictor = metric_predictor or predictor
    rows = []
    dump_dir = getattr(cfg, "dump_dir", None)
    for i, scenes in enumerate(scenes_iter):
        if i >= cfg.eval_count:
            break
        key = jax.random.fold_in(rng, i)
        scenes = jnp.asarray(scenes)
        if cfg.norm_type == "image":
            adv, ben = attack(predictor.variables, scenes, key)
            masks = jnp.ones(adv.shape[:3] + (1,), adv.dtype)
        elif cfg.norm_type == "vanila":
            adv, ben, masks, _ = attack(
                predictor.variables, scenes, vanila_obj,
                cfg.batch_size, key, eval_mode=True)
        else:
            adv, ben, masks, _ = attack(
                predictor.variables, scenes, cfg.batch_size, key,
                eval_mode=True)
        errs = _batch_metrics(metric_predictor, adv, ben, masks)
        rows.append(np.asarray(jnp.stack(errs)))

        if dump_dir:
            # image dumps like evaluate_depth_physical.py:124-165:
            # attacked/benign scenes + 6-panel disparity comparison
            import os

            from ..utils.visualize import eval_depth_diff, save_pic

            os.makedirs(dump_dir, exist_ok=True)
            save_pic(np.asarray(adv[0]),
                     os.path.join(dump_dir, f"adv_{i:03d}.png"))
            save_pic(np.asarray(ben[0]),
                     os.path.join(dump_dir, f"ben_{i:03d}.png"))
            panel, _, _ = eval_depth_diff(
                np.asarray(ben[0]), np.asarray(adv[0]),
                predictor=metric_predictor)
            panel.save(os.path.join(dump_dir, f"panel_{i:03d}.png"))

    rows = np.stack(rows)  # (n, 8)
    return {
        "mean": dict(zip(METRIC_NAMES, rows.mean(axis=0).tolist())),
        "max": dict(zip(METRIC_NAMES, rows.max(axis=0).tolist())),
    }


def iter_eval_scenes(dataset, cfg: AttackEvalConfig,
                     batch_size: int = None, count: int = None):
    """Scene batches from KittiObjectScenes starting at start_idx
    (evaluate_depth.py:154-171: sequential val batches, no shuffle).
    Indices wrap for datasets smaller than start_idx + count*batch.
    batch_size/count override cfg (e.g. the distill per-epoch eval
    loads single scenes the attack then replicates,
    simple_adv_training.py:64-74)."""
    n = len(dataset)
    bs = cfg.batch_size if batch_size is None else batch_size
    idx = cfg.start_idx % n
    for _ in range(cfg.eval_count if count is None else count):
        imgs = [dataset[(idx + j) % n][0] for j in range(bs)]
        idx += bs
        yield np.stack(imgs)
