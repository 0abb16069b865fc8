"""Longitudinal hardening demo at bench scale (one v5e chip).

Runs N distillation-hardening steps at the full 1024x320 / batch-32
bench configuration on synthetic scenes and reports the loss curve and
the attack-induced depth error (mean |depth(adv)-depth(ben)| inside the
object mask, eval-pinned EoT sample) before and after — the
real-resolution companion to the tiny-shape convergence tests
(tests/test_convergence.py), since real KITTI is not present in this
environment.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/longrun_demo.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from depthmodelhardening_tpu.data.synthetic import (
    make_car_object, make_scene,
)
from depthmodelhardening_tpu.models.wrappers import (
    init_monodepth2, predictor_from,
)
from depthmodelhardening_tpu.ops.metrics import get_mean_depth_diff
from depthmodelhardening_tpu.training.config import DistillConfig
from depthmodelhardening_tpu.training.distill import DistillTrainer

STEPS = 100
BATCH = 32
H, W = 320, 1024
ORI_H, ORI_W = 375, 1242


def attack_effect(trainer, state, eval_scene):
    student = trainer.student_variables(state)
    adv, ben, masks, _ = trainer.attack(
        student, eval_scene, trainer.cfg.batch_size,
        jax.random.PRNGKey(7), eval_mode=True)
    d_adv = trainer.model.apply(student, adv, train=False)
    d_ben = trainer.model.apply(student, ben, train=False)
    return float(get_mean_depth_diff(d_adv, d_ben, masks, use_abs=True))


def main():
    adv_type = sys.argv[1] if len(sys.argv) > 1 else "object"
    teacher_model, tvars = init_monodepth2(jax.random.PRNGKey(0), H, W,
                                           dtype=jnp.bfloat16)
    teacher = predictor_from(teacher_model, tvars)
    obj, mask = make_car_object(300, 200, seed=0)
    cfg = DistillConfig(adv_type=adv_type, epsilon=0.1, alpha=0.005,
                        steps=10, batch_size=BATCH,
                        scene_h=H, scene_w=W, ori_h=ORI_H, ori_w=ORI_W,
                        learning_rate=1e-4, compute_dtype="bfloat16",
                        attack_crop_w=384, attack_crop_h=256,
                        s2d_stem=True)
    # student starts from the teacher weights (the paper's fine-tune
    # recipe); bf16 teacher vars are the student's init too
    trainer = DistillTrainer(cfg, jax.random.PRNGKey(1), obj, mask,
                             teacher, init_variables=tvars)
    state = trainer.make_state()

    scene_pool = [jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=10 + i))
                  for i in range(8)]
    eval_scene = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=99))

    before = attack_effect(trainer, state, eval_scene)
    losses = []
    t0 = time.perf_counter()
    for step in range(STEPS):
        state, metrics = trainer.train_step(
            state, scene_pool[step % len(scene_pool)],
            jax.random.PRNGKey(1000 + step))
        if step % 10 == 0 or step == STEPS - 1:
            losses.append((step, float(metrics["loss"])))
            print(f"step {step:4d} loss {losses[-1][1]:.6f}",
                  flush=True)
    dt = time.perf_counter() - t0
    after = attack_effect(trainer, state, eval_scene)

    print(json.dumps({
        "adv_type": adv_type,
        "steps": STEPS,
        "imgs_per_sec": round(STEPS * BATCH / dt, 2),
        "loss_first": losses[0][1], "loss_last": losses[-1][1],
        "atk_depth_err_before_m": round(before, 4),
        "atk_depth_err_after_m": round(after, 4),
        "reduction": round(1 - after / max(before, 1e-9), 4),
    }))


if __name__ == "__main__":
    main()
