"""Profile the FULL hardening train step (config 4) and print top HLO
ops by self time — same config as scripts/bench_configs.py
bench_hardening so the compilation cache is shared.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_hardening.py
"""

import os
import time

import jax
import jax.numpy as jnp

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


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def main():
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

    def step(state, i):
        return trainer.train_step(state, frames, side, flip, scenes,
                                  jax.random.PRNGKey(100 + i))

    state, m = step(state, 0)
    _sync(m["loss"])
    tmpdir = f"/tmp/jaxprof_hard_{int(time.time())}"
    with jax.profiler.trace(tmpdir):
        state, m = step(state, 1)
        _sync(m["loss"])
    print("trace:", tmpdir)


if __name__ == "__main__":
    main()
