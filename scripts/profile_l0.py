"""Profile the L0 attack inner loop at bench shapes (VERDICT r4 #5).

Reproduces L0ObjectAttack._optimize's while_loop (attacks/l0_object.py
:109-133) step by step in a host loop — same cost/grad/Adam/mask-wt
schedule — and reports, per iteration: the L0 ratio, whether the early
break (ratio <= l0_thresh AND step >= steps) would fire, and the
iteration wall time. Also confirms which objective branch the bench
config takes (color_jit=False -> the FUSED tile->crop objective;
the color-jitter fallback would disable the fusion).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_l0.py
"""

import time

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from depthmodelhardening_tpu.data.synthetic import (
    make_car_object, make_scene,
)
from depthmodelhardening_tpu.models.wrappers import (
    init_monodepth2, predictor_from,
)
from depthmodelhardening_tpu.training.config import (
    AdvSynthConfig, HardeningConfig, SelfSupConfig,
)
from depthmodelhardening_tpu.training.hardening import HardeningTrainer

BATCH = 32
H, W = 320, 1024
ORI_H, ORI_W = 375, 1242


def main():
    rng = jax.random.PRNGKey(0)
    teacher_model, tvars = init_monodepth2(
        rng, H, W, dtype=jnp.bfloat16, scales=(0,), fold_bn=True,
        wpack_stem8=True, wpack_decoder=True)
    teacher = predictor_from(teacher_model, tvars)
    obj, mask = make_car_object(300, 200, seed=0)
    cfg = HardeningConfig(
        selfsup=SelfSupConfig(height=H, width=W, frame_ids=("0", "s")),
        adv=AdvSynthConfig(norm_type="l_0", steps=10,
                           attack_batch_size=BATCH,
                           attack_crop_w=320, attack_crop_h=256,
                           attack_view_dtype="bfloat16",
                           ori_h=ORI_H, ori_w=ORI_W),
        batch_size=BATCH, compute_dtype="bfloat16",
        wpack_stem8=True, wpack_decoder=True)
    trainer = HardeningTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                               teacher=teacher, steps_per_epoch=100)
    atk = trainer.attack
    print("fused crop objective active:", atk.jitter is None,
          "(color_jit =", atk.color_jit, ")")
    state = trainer.make_state()
    student = trainer.student_variables(state)
    scenes = atk._replicate(
        jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2)), BATCH)

    k_pos, k_neg, k_loop = jax.random.split(jax.random.PRNGKey(5), 3)
    shape = atk.obj_img.shape
    pos_t = jax.random.uniform(k_pos, shape)
    neg_t = jax.random.uniform(k_neg, shape)
    opt_state = atk.optimizer.init((pos_t, neg_t))
    l0_init = float(atk._cal_l0(pos_t, neg_t))

    def total_cost(params, z0s, alphas, mask_weight):
        p, n = params
        pp, pn = atk._patterns(p, n)
        obj_adv = jnp.clip(atk.obj_img + pp + pn, 0.0, 1.0)
        adv_cost = atk._objective(student, scenes, obj_adv, z0s,
                                  alphas, transform=None)
        return adv_cost + mask_weight * atk._mask_cost(p, n)

    grad_fn = jax.grad(total_cost)

    @jax.jit
    def body(step, params, opt_state):
        ratio = atk._cal_l0(*params) / l0_init
        mask_weight = jnp.where(ratio <= atk.l0_thresh, 0.0,
                                atk.mask_wt)
        z0s, alphas = atk._sample_za(
            jax.random.fold_in(k_loop, step), BATCH)
        grads = grad_fn(params, z0s, alphas, mask_weight)
        updates, opt_state = atk.optimizer.update(grads, opt_state,
                                                  params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, ratio

    params = (pos_t, neg_t)
    # warm the compile before timing
    p2, o2, r = body(0, params, opt_state)
    float(r)
    total = 0.0
    for step in range(2 * atk.steps):
        t0 = time.perf_counter()
        params, opt_state, ratio = body(step, params, opt_state)
        r = float(ratio)
        dt = (time.perf_counter() - t0) * 1000
        total += dt
        stop = r <= atk.l0_thresh and step >= atk.steps
        print(f"iter {step:2d}: l0_ratio {r:6.3f}  {dt:7.1f} ms"
              f"{'  <- early break would fire' if stop else ''}",
              flush=True)
        if stop:
            break
    print(f"total {total:.1f} ms over the loop "
          f"(max {2 * atk.steps} iterations; bench attack_ms is the "
          f"fused while_loop of the same bodies)")


if __name__ == "__main__":
    main()
