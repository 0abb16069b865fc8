"""Robustness evaluation sweeps.

Thin drivers mirroring the reference's evaluation variants:
  * attack_steps_sweep  — robustness vs PGD step count 1..101
    (evaluate_depth_atkSteps.py:194-223);
  * crosscheck_matrix   — attack-transferability matrix between models
    (evaluate_depth_crosscheck.py:205-215: attack the source, measure
    the target);
  * objects_sweep       — generalization to unseen objects
    (evaluate_depth_objects.py:194-204: Sedan/Subaru/Truck/SUV/
    TrafficBarrier textures with their metric sizes);
  * physical_eval       — real photographed patch validation
    (evaluate_depth_physical.py:124-165).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np

from ..physics.eot import VEHICLE_SIZES
from .attack_eval import (
    AttackEvalConfig, build_attack, evaluate_attacks,
)


def attack_steps_sweep(predictor, obj_img, obj_mask, make_scenes,
                       cfg: AttackEvalConfig,
                       candi_steps: Sequence[int] = tuple(
                           range(1, 102, 10))) -> Dict[int, Dict]:
    """Evaluate the same attack at increasing step counts
    (evaluate_depth_atkSteps.py:194-223; setup_seed(17) per run)."""
    results = {}
    for steps in candi_steps:
        c = dataclasses.replace(cfg, step=steps)
        attack = build_attack(c, predictor.apply_fn, obj_img, obj_mask)
        results[steps] = evaluate_attacks(
            predictor, attack, make_scenes(), c,
            rng=jax.random.PRNGKey(17))
    return results


def crosscheck_matrix(predictors: Dict[str, object], obj_img, obj_mask,
                      make_scenes, cfg: AttackEvalConfig
                      ) -> Dict[str, Dict[str, Dict]]:
    """results[source][target]: attack optimized on `source`, metrics
    measured on `target` (evaluate_depth_crosscheck.py:205-215)."""
    results: Dict[str, Dict[str, Dict]] = {}
    for src_name, src in predictors.items():
        attack = build_attack(cfg, src.apply_fn, obj_img, obj_mask)
        results[src_name] = {}
        for tgt_name, tgt in predictors.items():
            results[src_name][tgt_name] = evaluate_attacks(
                src, attack, make_scenes(), cfg,
                rng=jax.random.PRNGKey(17), metric_predictor=tgt)
    return results


def objects_sweep(predictor, objects: Dict[str, tuple], make_scenes,
                  cfg: AttackEvalConfig) -> Dict[str, Dict]:
    """Evaluate per unseen object (evaluate_depth_objects.py:194-204).

    objects: {name: (obj (1,H,W,3), mask (1,H,W,1))}; vehicle metric
    sizes are looked up from VEHICLE_SIZES by name prefix
    (physicalTrans.py:35-40).
    """
    results = {}
    for name, (obj, mask) in objects.items():
        c = dataclasses.replace(cfg, obj_name=name)
        attack = build_attack(c, predictor.apply_fn, obj, mask)
        results[name] = evaluate_attacks(
            predictor, attack, make_scenes(), c,
            rng=jax.random.PRNGKey(17))
    return results


def physical_eval(predictor, obj_img, obj_mask, adv_obj_img, make_scenes,
                  cfg: AttackEvalConfig) -> Dict:
    """Project a real photographed adversarial object across scenes and
    measure the depth error it induces
    (evaluate_depth_physical.py:124-165)."""
    c = dataclasses.replace(cfg, norm_type="physical")
    attack = build_attack(c, predictor.apply_fn, obj_img, obj_mask,
                          adv_obj_img=adv_obj_img)
    return evaluate_attacks(predictor, attack, make_scenes(), c,
                            rng=jax.random.PRNGKey(17))
