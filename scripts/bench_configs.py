"""One-run bench of the three training configurations (VERDICT r2 #3/#7):

  1. config 3  — L-inf PGD-10 distill step (the headline bench.py metric)
  2. config 3b — L0 distill step (the longrun-demo hardening recipe:
     dual patterns + Adam, 2x inner iterations — reported separately)
  3. config 4  — FULL HardeningTrainer.train_step (L0 attack + EoT batch
     synth + supervised_adv + contrastive + photometric + Adam,
     ICLR'23 recipe) at 1024x320 batch 32, with its decomposition.

Plus `--only eval`: config 5 — one evaluate_attacks batch per eval
preset class at reference shapes (VERDICT r3 #5).

Prints one JSON line per config; paste the table into
docs/PERFORMANCE.md. All at 1024x320 model frames, batch 32, bf16,
with the measured-default rewrites (wpack stem/decoder, 320x256
attack crop — same as bench.py so the compile cache is shared).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_configs.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

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
from depthmodelhardening_tpu.training.config import (
    AdvSynthConfig, DistillConfig, HardeningConfig, SelfSupConfig,
)
from depthmodelhardening_tpu.training.distill import DistillTrainer
from depthmodelhardening_tpu.training.hardening import HardeningTrainer

BATCH = 32
H, W = 320, 1024
ORI_H, ORI_W = 375, 1242


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def timeit(f, *args, n=5):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def bench_distill(adv_type: str):
    rng = jax.random.PRNGKey(0)
    teacher_model, tvars = init_monodepth2(
        rng, H, W, dtype=jnp.bfloat16, scales=(0,), fold_bn=True, wpack_stem8=True,
        wpack_decoder=True)
    teacher = predictor_from(teacher_model, tvars)
    obj, mask = make_car_object(300, 200, seed=0)
    cfg = DistillConfig(adv_type=adv_type, epsilon=0.1, alpha=0.005,
                        steps=10, batch_size=BATCH,
                        scene_h=H, scene_w=W, ori_h=ORI_H, ori_w=ORI_W,
                        compute_dtype="bfloat16",
                        attack_crop_w=320, attack_crop_h=256,
                        attack_view_dtype="bfloat16",
                        wpack_stem8=True, wpack_decoder=True)
    trainer = DistillTrainer(cfg, jax.random.PRNGKey(1), obj, mask,
                             teacher)
    state = trainer.make_state()
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))

    def step(state, i):
        return trainer.train_step(state, scenes,
                                  jax.random.PRNGKey(100 + i))

    state, m = step(state, 0)  # compile
    _sync(m["loss"])
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, 1 + i)
    _sync(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1000
    return {"metric": f"distill_{adv_type}_1024x320",
            "step_ms": round(ms, 1),
            "imgs_per_sec": round(BATCH / ms * 1000, 2)}


def bench_hardening():
    rng = jax.random.PRNGKey(0)
    teacher_model, tvars = init_monodepth2(
        rng, H, W, dtype=jnp.bfloat16, scales=(0,), fold_bn=True, wpack_stem8=True,
        wpack_decoder=True)
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
    state = trainer.make_state()

    frames = {"0": jnp.asarray(make_scene(BATCH, ORI_H, ORI_W, seed=0)),
              "s": jnp.asarray(make_scene(BATCH, ORI_H, ORI_W, seed=1))}
    side = jnp.ones((BATCH,), bool)
    flip = jnp.zeros((BATCH,), bool)
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))

    # decomposition: the L0 attack alone (the dominant part), then the
    # full fused step
    student = trainer.student_variables(state)
    scenes_rep = trainer.attack._replicate(scenes, BATCH)
    opt = jax.jit(lambda v, s, k: trainer.attack._optimize(v, s, k))
    t_atk = timeit(opt, student, scenes_rep, jax.random.PRNGKey(5))

    def step(state, i):
        return trainer.train_step(state, frames, side, flip, scenes,
                                  jax.random.PRNGKey(100 + i))

    state, m = step(state, 0)  # compile
    _sync(m["loss"])
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, 1 + i)
    _sync(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1000
    return {"metric": "hardening_full_l0_1024x320",
            "step_ms": round(ms, 1),
            "imgs_per_sec": round(BATCH / ms * 1000, 2),
            "attack_ms": round(t_atk, 1),
            "rest_ms": round(ms - t_atk, 1)}


def bench_family(family: str):
    """VERDICT r3 #7: one measured hardening-step row for the
    ManyDepth family (zero-lookup reference mode,
    manydepth2/trainer.py:345-386) and for DepthHints
    (proxy-supervised hint loss, depth-hints/trainer.py:541-591) at
    1024x320 / batch 32."""
    rng = jax.random.PRNGKey(0)
    teacher_model, tvars = init_monodepth2(
        rng, H, W, dtype=jnp.bfloat16, scales=(0,), fold_bn=True,
        wpack_stem8=True, wpack_decoder=True)
    teacher = predictor_from(teacher_model, tvars)
    obj, mask = make_car_object(300, 200, seed=0)
    ss = SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))
    adv = AdvSynthConfig(norm_type="l_0", steps=10,
                         attack_batch_size=BATCH,
                         attack_crop_w=320, attack_crop_h=256,
                         attack_view_dtype="bfloat16",
                         ori_h=ORI_H, ori_w=ORI_W)
    if family == "manydepth":
        cfg = HardeningConfig(
            selfsup=ss, adv=adv, batch_size=BATCH,
            compute_dtype="bfloat16", model_family="manydepth",
            wpack_decoder=True)
    elif family == "depth_hints":
        cfg = HardeningConfig(
            selfsup=ss, adv=adv, batch_size=BATCH,
            compute_dtype="bfloat16", use_depth_hints=True,
            contras_loss_wt=0.1,  # depth-hints/trainer.py:617
            wpack_stem8=True, wpack_decoder=True)
    else:
        raise ValueError(family)
    trainer = HardeningTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                               teacher=teacher, steps_per_epoch=100)
    state = trainer.make_state()
    frames = {"0": jnp.asarray(make_scene(BATCH, ORI_H, ORI_W, seed=0)),
              "s": jnp.asarray(make_scene(BATCH, ORI_H, ORI_W, seed=1))}
    if family == "depth_hints":
        k = jax.random.PRNGKey(11)
        frames["depth_hint"] = jax.random.uniform(
            k, (BATCH, H, W, 1), minval=1.0, maxval=40.0)
        frames["depth_hint_mask"] = jnp.ones((BATCH, H, W, 1))
    side = jnp.ones((BATCH,), bool)
    flip = jnp.zeros((BATCH,), bool)
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))

    def step(state, i):
        return trainer.train_step(state, frames, side, flip, scenes,
                                  jax.random.PRNGKey(100 + i))

    state, m = step(state, 0)  # compile
    _sync(m["loss"])
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, 1 + i)
    _sync(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1000
    return {"metric": f"hardening_{family}_l0_1024x320",
            "step_ms": round(ms, 1),
            "imgs_per_sec": round(BATCH / ms * 1000, 2)}


def bench_eval(only=None):
    """Config 5 (VERDICT r3 #5): time ONE evaluate_attacks batch per
    eval preset class at reference shapes (batch 12, 1024x320 model /
    1242x375 scenes, eval_mode pins sample 0) — the attack call plus
    both predictor forwards and the masked 8-tuple metrics, i.e. one
    iteration of evaluate_depth.py:154-197. Presets mirror the
    reference __main__ zoo (evaluate_depth.py:403-517)."""
    from depthmodelhardening_tpu.evaluation.attack_eval import (
        AttackEvalConfig, _batch_metrics, build_attack,
    )
    from depthmodelhardening_tpu.models.wrappers import DepthPredictor

    rng = jax.random.PRNGKey(0)
    model, mvars = init_monodepth2(
        rng, H, W, dtype=jnp.bfloat16, scales=(0,), fold_bn=True, wpack_stem8=True,
        wpack_decoder=True)
    predictor = predictor_from(model, mvars)
    obj, mask = make_car_object(300, 200, seed=0)
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=3))

    presets = {
        "l_inf": AttackEvalConfig(norm_type="l_inf", step=10),
        "l_0": AttackEvalConfig(norm_type="l_0", step=10),
        "l_2": AttackEvalConfig(norm_type="l_2", epsilon=5.0, step=10),
        "APGD": AttackEvalConfig(norm_type="APGD", step=10),
        "Square": AttackEvalConfig(norm_type="Square", n_queries=5000),
        "light": AttackEvalConfig(norm_type="light", n_inits=200,
                                  n_neighbors=20),
        # watchdog-sized variants: the full Square@5000 / light@200x20
        # presets fuse a 60-75 s single device program, which this
        # environment's tunnel watchdog kills (TPU worker restart,
        # reproduced 3x — an axon limit, not a code path issue); the
        # reduced rows measure the same program at 1/5 the
        # search length and scale linearly
        "Square1k": AttackEvalConfig(norm_type="Square",
                                     n_queries=1000),
        "light40": AttackEvalConfig(norm_type="light", n_inits=40,
                                    n_neighbors=20),
        "arbi": AttackEvalConfig(norm_type="arbi"),
        "guassian": AttackEvalConfig(norm_type="guassian", step=10),
    }
    # one jitted program for the two predictor forwards + masked
    # metrics — called eagerly, each layer op pays a full tunnel
    # round-trip (~35 s/batch measured)
    metrics_fn = jax.jit(lambda adv, ben, masks: jnp.stack(
        _batch_metrics(predictor, adv, ben, masks)))

    out = []
    for name, cfg in presets.items():
        if only and name != only:
            continue
        attack = build_attack(cfg, predictor.apply_fn, obj, mask)

        def run(key, _atk=attack, _cfg=cfg):
            adv, ben, masks, _ = _atk(predictor.variables, scenes,
                                      _cfg.batch_size, key,
                                      eval_mode=True)
            return metrics_fn(adv, ben, masks)

        t_c0 = time.perf_counter()
        _sync(run(jax.random.PRNGKey(17)))  # compile + first run
        compile_s = time.perf_counter() - t_c0
        n = 3
        t0 = time.perf_counter()
        for i in range(n):
            r = run(jax.random.PRNGKey(18 + i))
        _sync(r)
        ms = (time.perf_counter() - t0) / n * 1000
        rec = {"metric": f"eval_batch_{name}_1024x320_b12",
               "batch_ms": round(ms, 1),
               "imgs_per_sec": round(cfg.batch_size / ms * 1000, 2),
               "first_call_s": round(compile_s, 1)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["linf", "l0", "hardening",
                                       "manydepth", "depth_hints",
                                       "eval"], default=None)
    ap.add_argument("--eval-only", default=None,
                    help="restrict --only eval to one preset name")
    args = ap.parse_args()
    jobs = {
        "linf": lambda: bench_distill("object"),
        "l0": lambda: bench_distill("object_l0"),
        "hardening": bench_hardening,
        "manydepth": lambda: bench_family("manydepth"),
        "depth_hints": lambda: bench_family("depth_hints"),
        "eval": lambda: bench_eval(args.eval_only),
    }
    opt_in = {"eval", "manydepth", "depth_hints"}  # long compiles
    for name, fn in jobs.items():
        if args.only and name != args.only:
            continue
        if name in opt_in and not args.only:
            continue
        out = fn()
        if name != "eval":
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
