"""Decompose the headline bench step: attack loop / finals / teacher /
student costs, measured as separate jitted programs at bench shapes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_step_parts.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")

from depthmodelhardening_tpu.data.synthetic import make_car_object, make_scene
from depthmodelhardening_tpu.models.wrappers import (
    init_monodepth2, predictor_from,
)
from depthmodelhardening_tpu.training.config import DistillConfig
from depthmodelhardening_tpu.training.distill import DistillTrainer

BATCH = 32
H, W = 320, 1024
ORI_H, ORI_W = 375, 1242


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def timeit(f, *args, n=10):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = jax.random.PRNGKey(0)
    teacher_model, teacher_vars = init_monodepth2(
        rng, H, W, dtype=jnp.bfloat16, scales=(0,), wpack_stem8=True,
        wpack_decoder=True)
    teacher = predictor_from(teacher_model, teacher_vars)
    obj, mask = make_car_object(300, 200, seed=0)
    cfg = DistillConfig(adv_type="object", epsilon=0.1, alpha=0.005,
                        steps=10, batch_size=BATCH,
                        scene_h=H, scene_w=W, ori_h=ORI_H, ori_w=ORI_W,
                        compute_dtype="bfloat16",
                        attack_crop_w=384, attack_crop_h=256,
                        wpack_stem8=True, wpack_decoder=True)
    trainer = DistillTrainer(cfg, jax.random.PRNGKey(1), obj, mask,
                             teacher)
    state = trainer.make_state()
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))
    student = trainer.student_variables(state)
    atk = trainer.attack
    scenes_full = atk._replicate(scenes, BATCH)
    key = jax.random.PRNGKey(3)

    optimize = jax.jit(lambda v, s, k: atk._optimize(v, s, k))
    t_opt = timeit(optimize, student, scenes_full, key)
    obj_adv = optimize(student, scenes_full, key)

    finals = jax.jit(lambda v, s, o, k: atk._final_outputs(
        s, o, k, False))
    t_fin = timeit(finals, student, scenes_full, obj_adv, key)
    adv, ben, _ = finals(student, scenes_full, obj_adv, key)

    t_teacher = timeit(jax.jit(
        lambda v, x: teacher.apply_fn(v, x)), teacher_vars, ben)

    def student_update(params, bs, adv, gt):
        def loss_fn(p):
            v = {"params": p, "batch_stats": bs}
            pred, _ = trainer.model.apply(v, adv, train=True,
                                          mutable=["batch_stats"])
            return jnp.mean((gt - pred) ** 2)
        return jax.grad(loss_fn)(params)

    gt = teacher.apply_fn(teacher_vars, ben)
    t_student = timeit(jax.jit(student_update), state.params,
                       state.batch_stats, adv, gt)

    full = jax.jit(lambda st, s, k: trainer._step(st, s, k))
    t_full = timeit(full, state, scenes_full[:1], key, n=5)

    print(f"attack optimize (10 PGD steps): {t_opt:7.1f} ms")
    print(f"  per PGD step:                 {t_opt/10:7.1f} ms")
    print(f"final outputs (pair composite): {t_fin:7.1f} ms")
    print(f"teacher fwd (full frame):       {t_teacher:7.1f} ms")
    print(f"student grad (full frame):      {t_student:7.1f} ms")
    print(f"full train step:                {t_full:7.1f} ms "
          f"({BATCH / t_full * 1000:.1f} imgs/s)")


if __name__ == "__main__":
    main()
