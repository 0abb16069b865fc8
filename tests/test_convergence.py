"""Longitudinal convergence evidence on synthetic data (slow).

The unit/parity suite only exercises single steps; these tests run tens
of steps at tiny shapes and assert the training signals actually move
the right way — the in-environment stand-in for the reference's
"metric parity after hardening" claim (trainer.py:289-333 recipe,
simple_adv_training.py:96-156 distillation loop), since real KITTI is
not available in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.data.synthetic import (
    make_car_object, make_scene, make_stereo_pair,
)
from depthmodelhardening_tpu.models.wrappers import (
    init_monodepth2, predictor_from,
)
from depthmodelhardening_tpu.ops.metrics import get_mean_depth_diff

pytestmark = pytest.mark.slow

H, W = 64, 192
ORI_H, ORI_W = 96, 320


def _attack_effect(trainer, state, eval_scene, batch_size):
    """Mean |depth(adv) - depth(ben)| inside the object mask for the
    in-training student, eval-pinned EoT sample (my_utils.py:31-41)."""
    student = trainer.student_variables(state)
    adv, ben, masks, _ = trainer.attack(
        student, eval_scene, batch_size, jax.random.PRNGKey(7),
        eval_mode=True)
    d_adv = trainer.model.apply(student, adv, train=False)
    d_ben = trainer.model.apply(student, ben, train=False)
    return float(get_mean_depth_diff(d_adv, d_ben, masks, use_abs=True))


def test_distill_training_reduces_attack_effect():
    """~40 distillation steps reduce both the loss and the depth error
    the PGD object attack induces on the student
    (simple_adv_training.py:126-141 + eval_atk_perf semantics)."""
    from depthmodelhardening_tpu.training.config import DistillConfig
    from depthmodelhardening_tpu.training.distill import DistillTrainer

    teacher_model, tvars = init_monodepth2(jax.random.PRNGKey(0), H, W)
    teacher = predictor_from(teacher_model, tvars)
    obj, mask = make_car_object(36, 24, seed=0)
    cfg = DistillConfig(adv_type="object", epsilon=0.1, alpha=0.01,
                        steps=3, batch_size=4, scene_h=H, scene_w=W,
                        ori_h=ORI_H, ori_w=ORI_W, learning_rate=1e-3,
                        compute_dtype="float32")
    # student starts at the teacher's weights (the recipe hardens a
    # pretrained model)
    trainer = DistillTrainer(cfg, jax.random.PRNGKey(1), obj, mask,
                             teacher, init_variables=tvars)
    state = trainer.make_state()

    eval_scene = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=99))
    before = _attack_effect(trainer, state, eval_scene, cfg.batch_size)

    scenes = jnp.asarray(make_scene(2, ORI_H, ORI_W, seed=3))
    losses = []
    for step in range(40):
        state, metrics = trainer.train_step(
            state, scenes[step % 2:step % 2 + 1],
            jax.random.PRNGKey(100 + step))
        losses.append(float(metrics["loss"]))

    after = _attack_effect(trainer, state, eval_scene, cfg.batch_size)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses
    assert after < before, (before, after)


def test_hardening_losses_trend_down():
    """~50 full hardening steps (texture attack + stereo-consistent
    synthesis + sup/contrastive/photometric losses) on a consistent
    synthetic stereo pair: the self-supervised and supervised losses
    must trend down and the attack-induced depth error must not grow."""
    from depthmodelhardening_tpu.training.config import (
        AdvSynthConfig, HardeningConfig, SelfSupConfig,
    )
    from depthmodelhardening_tpu.training.hardening import HardeningTrainer

    teacher_model, tvars = init_monodepth2(jax.random.PRNGKey(2), H, W)
    teacher = predictor_from(teacher_model, tvars)
    obj, mask = make_car_object(36, 24, seed=0)
    cfg = HardeningConfig(
        selfsup=SelfSupConfig(height=H, width=W, frame_ids=("0", "s")),
        adv=AdvSynthConfig(norm_type="l_inf", steps=2,
                           attack_batch_size=4, epsilon=0.1, alpha=0.02,
                           ori_h=ORI_H, ori_w=ORI_W),
        batch_size=4, learning_rate=3e-4, compute_dtype="float32")
    trainer = HardeningTrainer(cfg, jax.random.PRNGKey(3), obj, mask,
                               teacher=teacher, steps_per_epoch=1000,
                               init_variables={"depth": tvars})
    state = trainer.make_state()

    left, right = make_stereo_pair(4, ORI_H, ORI_W, shift=10, seed=5)
    frames = {"0": jnp.asarray(left), "s": jnp.asarray(right)}
    side = jnp.ones((4,), bool)
    flip = jnp.zeros((4,), bool)
    scenes = jnp.asarray(make_scene(4, ORI_H, ORI_W, seed=6))
    eval_scene = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=99))

    before = _attack_effect(trainer, state, eval_scene,
                            cfg.adv.attack_batch_size)

    selfsup, sup = [], []
    for step in range(50):
        state, metrics = trainer.train_step(
            state, frames, side, flip, scenes,
            jax.random.PRNGKey(1000 + step))
        selfsup.append(float(metrics["selfsup_loss"]))
        sup.append(float(metrics["sup_loss"]))

    after = _attack_effect(trainer, state, eval_scene,
                           cfg.adv.attack_batch_size)
    assert np.isfinite(selfsup).all() and np.isfinite(sup).all()
    assert np.mean(selfsup[-10:]) < np.mean(selfsup[:10]), selfsup
    assert np.mean(sup[-10:]) < np.mean(sup[:10]), sup
    # hardening must not make the student MORE attackable
    assert after < before * 1.1, (before, after)
