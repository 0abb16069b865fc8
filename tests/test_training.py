"""Training-layer tests: self-supervised losses, adv synthesis, distill
and hardening steps, and multi-device data parallelism on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.data.synthetic import make_car_object, make_scene
from depthmodelhardening_tpu.models.wrappers import (
    init_monodepth2, predictor_from,
)
from depthmodelhardening_tpu.parallel.mesh import make_mesh
from depthmodelhardening_tpu.training.adv_synth import (
    make_synth_compositor, stereo_T_batch, synthesize_adv_batch,
)
from depthmodelhardening_tpu.training.config import (
    AdvSynthConfig, DistillConfig, HardeningConfig, SelfSupConfig,
)
from depthmodelhardening_tpu.training.distill import DistillTrainer
from depthmodelhardening_tpu.training.hardening import (
    HardeningTrainer, _scaled_K,
)
from depthmodelhardening_tpu.training.selfsup import compute_selfsup_losses

H, W = 64, 192  # model resolution (divisible by 32)
ORI_H, ORI_W = 96, 320
OBJ_H, OBJ_W = 24, 36


def _small_selfsup():
    return SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))


def _batch_for_selfsup(rng, B=2, cfg=None):
    cfg = cfg or _small_selfsup()
    k1, k2 = jax.random.split(rng)
    target = jax.random.uniform(k1, (B, H, W, 3))
    other = jax.random.uniform(k2, (B, H, W, 3))
    K, inv_K = _scaled_K(H, W)
    side = jnp.ones((B,), bool)
    flip = jnp.zeros((B,), bool)
    return {
        "color": {"0": target, "s": other},
        "color_aug": {"0": target, "s": other},
        "K": jnp.broadcast_to(jnp.asarray(K), (B, 4, 4)),
        "inv_K": jnp.broadcast_to(jnp.asarray(inv_K), (B, 4, 4)),
        "stereo_T": stereo_T_batch(side, flip),
    }


def test_rectified_stereo_closed_form_matches_general():
    """The row-path's closed-form sample column
    sx = (x*depth + fx*tx)/(depth+eps) (training/selfsup.py) must
    reproduce the full backproject->transform->project chain +
    generic 2-D grid_sample on a rectified extrinsic."""
    import dataclasses

    from depthmodelhardening_tpu.training.selfsup import (
        generate_images_pred,
    )

    cfg = _small_selfsup()
    rng = jax.random.PRNGKey(3)
    batch = _batch_for_selfsup(rng)
    disps = {s: jax.random.uniform(
        jax.random.fold_in(rng, s),
        (2, H // 2 ** s, W // 2 ** s, 1), minval=0.05, maxval=0.9)
        for s in cfg.scales}
    row, _ = generate_images_pred(disps, batch, {}, cfg)
    gen, _ = generate_images_pred(
        disps, batch, {},
        dataclasses.replace(cfg, rectified_stereo=False))
    for key in row:
        np.testing.assert_allclose(np.asarray(row[key]),
                                   np.asarray(gen[key]), atol=2e-4)


@pytest.mark.slow
def test_selfsup_identical_frames_low_loss():
    """When source == target the automask identity branch should win and
    the reprojection part of the loss should be ~0 (uniform images also
    have ~0 smoothness after disp normalization of a constant disp)."""
    cfg = _small_selfsup()
    rng = jax.random.PRNGKey(0)
    img = jnp.broadcast_to(
        jnp.linspace(0.2, 0.8, W, dtype=jnp.float32)[None, None, :, None],
        (2, H, W, 3))
    batch = _batch_for_selfsup(rng)
    batch["color"] = {"0": img, "s": img}
    disps = {s: jnp.full((2, H // 2 ** s, W // 2 ** s, 1), 0.5)
             for s in cfg.scales}
    loss, aux = compute_selfsup_losses(disps, batch, {}, rng, cfg)
    # identity reprojection == 0, min picks it; smoothness of constant
    # disp == 0 -> only tie-break noise remains
    assert abs(float(loss)) < 1e-3


@pytest.mark.slow
def test_selfsup_loss_grads_finite():
    cfg = _small_selfsup()
    rng = jax.random.PRNGKey(1)
    batch = _batch_for_selfsup(rng)
    disps = {s: jnp.full((2, H // 2 ** s, W // 2 ** s, 1), 0.3)
             for s in cfg.scales}

    def f(d):
        loss, _ = compute_selfsup_losses(d, batch, {}, rng, cfg)
        return loss

    g = jax.grad(f)(disps)
    for s in cfg.scales:
        assert np.all(np.isfinite(np.asarray(g[s])))


def test_synthesize_adv_batch_shapes_and_consistency():
    """Adv texture only lands on the current frame; benign composite is
    the photometric target; untouched pixels match the raw frames."""
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    eot = make_synth_compositor(OBJ_H, OBJ_W, ORI_H, ORI_W)
    ss = _small_selfsup()
    adv_cfg = AdvSynthConfig(ori_h=ORI_H, ori_w=ORI_W)
    B = 4
    frames = {
        "0": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=0)),
        "s": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=1)),
    }
    obj_adv = jnp.clip(jnp.asarray(obj) + 0.2, 0, 1)
    side = jnp.asarray([True, True, False, False])
    flip = jnp.asarray([False, True, False, True])
    out = synthesize_adv_batch(eot, frames, obj_adv, jnp.asarray(obj),
                               jnp.asarray(mask), side, flip,
                               jax.random.PRNGKey(0), ss, adv_cfg)
    assert out["color"]["0"].shape == (B, H, W, 3)
    assert out["color_aug"]["0"].shape == (B, H, W, 3)
    assert out["objmask"].shape == (B, H, W, 1)
    # target is the benign composite (mono_dataset.py:257)
    np.testing.assert_allclose(np.asarray(out["color"]["0"]),
                               np.asarray(out["color_ben"]))
    # adv and ben composites differ exactly where the object sits
    diff = np.abs(np.asarray(out["color_aug"]["0"] - out["color_ben"]))
    m = np.asarray(out["objmask"])
    assert diff.max() > 1e-3
    assert diff[np.broadcast_to(m < 1e-6, diff.shape)].max() < 1e-4


def test_stereo_T_batch_signs():
    side = jnp.asarray([True, False, True, False])
    flip = jnp.asarray([False, False, True, True])
    T = np.asarray(stereo_T_batch(side, flip))
    np.testing.assert_allclose(T[:, 0, 3], [-0.1, 0.1, 0.1, -0.1],
                               atol=1e-7)


@pytest.fixture(scope="module")
def small_teacher():
    model, variables = init_monodepth2(jax.random.PRNGKey(7), H, W)
    return predictor_from(model, variables)


@pytest.mark.slow
def test_distill_step_updates_params(small_teacher):
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    cfg = DistillConfig(adv_type="object", steps=2, batch_size=2,
                        scene_h=H, scene_w=W, ori_h=ORI_H, ori_w=ORI_W)
    tr = DistillTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                        small_teacher)
    state = tr.make_state()
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=5))
    p_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = tr.train_step(state, scenes, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    p_after = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p_before), np.asarray(p_after))


@pytest.mark.slow  # heaviest parity compile (VERDICT r4 #6: keep the fast suite ~5 min); a lighter same-area case stays fast
def test_distill_step_attack_scale_packed(small_teacher):
    """The TPU perf flags together: packed decoder + scale-1 attack
    objective drive a full distill step through the real model."""
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    cfg = DistillConfig(adv_type="object", steps=2, batch_size=2,
                        scene_h=H, scene_w=W, ori_h=ORI_H, ori_w=ORI_W,
                        attack_scale=1, packed_decoder=True)
    tr = DistillTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                        small_teacher)
    assert tr.attack.predict_scale_fn is not None
    state = tr.make_state()
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=5))
    state, metrics = tr.train_step(state, scenes, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_distill_image_attack_step(small_teacher):
    cfg = DistillConfig(adv_type="image", steps=2, batch_size=2,
                        scene_h=H, scene_w=W, ori_h=ORI_H, ori_w=ORI_W)
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    tr = DistillTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                        small_teacher)
    state = tr.make_state()
    scenes = jnp.asarray(make_scene(2, ORI_H, ORI_W, seed=5))
    state, metrics = tr.train_step(state, scenes, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def _hardening_cfg(**kw):
    ss = SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))
    adv = AdvSynthConfig(norm_type=kw.pop("norm_type", "l_inf"), steps=2,
                         attack_batch_size=2, ori_h=ORI_H, ori_w=ORI_W)
    return HardeningConfig(selfsup=ss, adv=adv, batch_size=2, **kw)


@pytest.mark.slow
def test_hardening_step_full_recipe(small_teacher):
    """supervised + contrastive + photometric, l_inf texture refresh."""
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    cfg = _hardening_cfg()
    tr = HardeningTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                          teacher=small_teacher, steps_per_epoch=10)
    state = tr.make_state()
    B = 2
    frames = {"0": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=0)),
              "s": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=1))}
    side = jnp.asarray([True, False])
    flip = jnp.asarray([False, True])
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))
    state, metrics = tr.train_step(state, frames, side, flip, scenes,
                                   jax.random.PRNGKey(3))
    for k in ("loss", "sup_loss", "contras_loss", "selfsup_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1
    # second step reuses the compiled function
    state, metrics = tr.train_step(state, frames, side, flip, scenes,
                                   jax.random.PRNGKey(4))
    assert int(state.step) == 2


@pytest.mark.slow
def test_hardening_step_mono_pose(small_teacher):
    """Monocular frames exercise the pose-network branch."""
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    ss = SelfSupConfig(height=H, width=W, frame_ids=("0", "-1", "1", "s"))
    adv = AdvSynthConfig(norm_type="l_inf", steps=1, attack_batch_size=2,
                         ori_h=ORI_H, ori_w=ORI_W)
    cfg = HardeningConfig(selfsup=ss, adv=adv, batch_size=2,
                          contrastive_learning=False)
    tr = HardeningTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                          teacher=small_teacher, steps_per_epoch=10)
    state = tr.make_state()
    B = 2
    frames = {f: jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=i))
              for i, f in enumerate(("0", "s", "-1", "1"))}
    side = jnp.asarray([True, False])
    flip = jnp.asarray([False, False])
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=9))
    state, metrics = tr.train_step(state, frames, side, flip, scenes,
                                   jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_hardening_data_parallel_mesh(small_teacher):
    """The same step under an 8-device mesh: params replicated, batch
    sharded; result must be finite and the state stays replicated."""
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    ss = SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))
    adv = AdvSynthConfig(norm_type="l_inf", steps=2, attack_batch_size=8,
                         ori_h=ORI_H, ori_w=ORI_W)
    cfg = HardeningConfig(selfsup=ss, adv=adv, batch_size=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    tr = HardeningTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                          teacher=small_teacher, steps_per_epoch=10,
                          mesh=mesh)
    state = tr.make_state()
    B = 8
    frames = {"0": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=0)),
              "s": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=1))}
    side = jnp.ones((B,), bool)
    flip = jnp.zeros((B,), bool)
    scenes = jnp.asarray(make_scene(8, ORI_H, ORI_W, seed=2))
    state, metrics = tr.train_step(state, frames, side, flip, scenes,
                                   jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_hardening_manydepth_family(small_teacher):
    """ManyDepth family: cost-volume encoder in single-frame mode,
    /8.6437 rescale, full hardening objectives."""
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    ss = SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))
    adv = AdvSynthConfig(norm_type="l_inf", steps=1, attack_batch_size=2,
                         ori_h=ORI_H, ori_w=ORI_W)
    cfg = HardeningConfig(selfsup=ss, adv=adv, batch_size=2,
                          model_family="manydepth",
                          manydepth_num_depth_bins=4)
    tr = HardeningTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                          teacher=small_teacher, steps_per_epoch=10)
    state = tr.make_state()
    B = 2
    frames = {"0": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=0)),
              "s": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=1))}
    side = jnp.asarray([True, False])
    flip = jnp.asarray([False, False])
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))
    state, metrics = tr.train_step(state, frames, side, flip, scenes,
                                   jax.random.PRNGKey(3))
    for k in ("loss", "sup_loss", "contras_loss", "selfsup_loss"):
        assert np.isfinite(float(metrics[k])), k


@pytest.mark.slow
def test_build_plain_batch_and_selfsup_frames_step(small_teacher):
    """Vanilla (no-adv) training: plain batch building + jitted step."""
    from depthmodelhardening_tpu.training.adv_synth import (
        build_plain_batch,
    )

    ss = SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))
    B = 2
    frames = {"0": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=0)),
              "s": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=1))}
    side = jnp.asarray([True, False])
    flip = jnp.asarray([False, True])
    batch = build_plain_batch(frames, side, flip, jax.random.PRNGKey(0),
                              ss, color_aug=False)
    assert batch["color"]["0"].shape == (B, H, W, 3)
    # without jitter, aug planes equal the color planes
    np.testing.assert_allclose(np.asarray(batch["color_aug"]["0"]),
                               np.asarray(batch["color"]["0"]))
    # flipped item really flipped: compare against unflipped build
    batch_nf = build_plain_batch(frames, side,
                                 jnp.zeros((B,), bool),
                                 jax.random.PRNGKey(0), ss,
                                 color_aug=False)
    np.testing.assert_allclose(
        np.asarray(batch["color"]["0"][1]),
        np.asarray(batch_nf["color"]["0"][1, :, ::-1]), atol=1e-6)

    adv = AdvSynthConfig(ori_h=ORI_H, ori_w=ORI_W)
    cfg = HardeningConfig(selfsup=ss, adv=adv, batch_size=B,
                          supervised_adv=False,
                          contrastive_learning=False)
    tr = HardeningTrainer(cfg, jax.random.PRNGKey(0),
                          *make_car_object(OBJ_W, OBJ_H),
                          teacher=None, steps_per_epoch=10)
    state = tr.make_state()
    state, metrics = tr.selfsup_frames_step(state, frames, side, flip,
                                            jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_hardening_step_with_attack_crop(small_teacher):
    """attack_crop_w threads through HardeningConfig into the PGD
    loop's model view (attacks/base.py:_crop_to_object)."""
    obj, mask = make_car_object(OBJ_W, OBJ_H, seed=3)
    ss = SelfSupConfig(height=H, width=W, frame_ids=("0", "s"))
    adv = AdvSynthConfig(norm_type="l_inf", steps=2,
                         attack_batch_size=2, ori_h=ORI_H, ori_w=ORI_W,
                         tile_h=96, tile_w=96, attack_crop_w=128)
    cfg = HardeningConfig(selfsup=ss, adv=adv, batch_size=2)
    tr = HardeningTrainer(cfg, jax.random.PRNGKey(0), obj, mask,
                          teacher=small_teacher, steps_per_epoch=10)
    assert tr.attack.cfg.attack_crop_w == 128  # < scene_w: active
    state = tr.make_state()
    B = 2
    frames = {"0": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=0)),
              "s": jnp.asarray(make_scene(B, ORI_H, ORI_W, seed=1))}
    side = jnp.asarray([True, False])
    flip = jnp.asarray([False, True])
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))
    state, metrics = tr.train_step(state, frames, side, flip, scenes,
                                   jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_fine_tune_init_starts_student_at_pretrained():
    """--fine_tune semantics (trainer.py:70-91): a partial
    init_variables={"depth": pretrained} must leave the step-0 student
    disparity identical to the pretrained model's, while simsiam/pose
    collections are freshly initialized."""
    H, W = 64, 192
    model, tvars = init_monodepth2(jax.random.PRNGKey(0), H, W)
    teacher = predictor_from(model, tvars)
    obj, mask = make_car_object(24, 16, seed=0)
    cfg = HardeningConfig(
        selfsup=SelfSupConfig(height=H, width=W, frame_ids=("0", "s")),
        adv=AdvSynthConfig(norm_type="l_inf", steps=1,
                           attack_batch_size=2, ori_h=96, ori_w=320),
        batch_size=2, compute_dtype="float32")
    trainer = HardeningTrainer(cfg, jax.random.PRNGKey(1), obj, mask,
                               teacher=teacher, steps_per_epoch=10,
                               init_variables={"depth": tvars})
    state = trainer.make_state()
    assert "simsiam" in state.params  # freshly initialized collections

    x = jnp.asarray(make_scene(1, H, W, seed=2))
    d_student = trainer.model.apply(trainer.student_variables(state), x,
                                    train=False)
    d_teacher = teacher.apply_fn(tvars, x)
    np.testing.assert_allclose(np.asarray(d_student),
                               np.asarray(d_teacher), atol=0)


@pytest.mark.slow
def test_hardening_recipe_variant_flags():
    """gt_depth + half_no_synthesis and no_original_train variants run a
    full step with finite losses (options.py:150-156, 227-229;
    trainer.py:546-565 composite pseudo-depth)."""
    H, W = 64, 192
    model, tvars = init_monodepth2(jax.random.PRNGKey(0), H, W)
    teacher = predictor_from(model, tvars)
    obj, mask = make_car_object(24, 16, seed=0)

    def run(**kw):
        cfg = HardeningConfig(
            selfsup=SelfSupConfig(height=H, width=W,
                                  frame_ids=("0", "s")),
            adv=AdvSynthConfig(norm_type="l_inf", steps=1,
                               attack_batch_size=2, ori_h=96, ori_w=320,
                               half_no_synthesis=kw.pop(
                                   "half_no_synthesis", False)),
            batch_size=2, compute_dtype="float32", **kw)
        trainer = HardeningTrainer(cfg, jax.random.PRNGKey(1), obj,
                                   mask, teacher=teacher,
                                   steps_per_epoch=10)
        state = trainer.make_state()
        frames = {"0": jnp.asarray(make_scene(2, 96, 320, seed=2)),
                  "s": jnp.asarray(make_scene(2, 96, 320, seed=3))}
        state, metrics = trainer.train_step(
            state, frames, jnp.ones((2,), bool), jnp.zeros((2,), bool),
            jnp.asarray(make_scene(2, 96, 320, seed=4)),
            jax.random.PRNGKey(5))
        return metrics

    m = run(gt_depth=True, half_no_synthesis=True)
    assert np.isfinite(float(m["loss"]))
    assert "sup_loss" in m and np.isfinite(float(m["sup_loss"]))

    m = run(no_original_train=True)
    assert np.isfinite(float(m["loss"]))
    assert "selfsup_loss" not in m  # self-supervised branch dropped


@pytest.mark.slow
def test_manydepth_real_lookup_training_step():
    """Beyond-reference real-lookup ManyDepth training: the cost volume
    consumes the actual previous frame + pose-net pose (the reference
    zeroes lookups, manydepth2/trainer.py:345-386); one full step must
    run with finite losses and update encoder params."""
    H, W = 64, 192
    model, tvars = init_monodepth2(jax.random.PRNGKey(0), H, W)
    teacher = predictor_from(model, tvars)
    obj, mask = make_car_object(24, 16, seed=0)
    cfg = HardeningConfig(
        selfsup=SelfSupConfig(height=H, width=W,
                              frame_ids=("0", "-1", "s")),
        adv=AdvSynthConfig(norm_type="l_inf", steps=1,
                           attack_batch_size=2, ori_h=96, ori_w=320),
        model_family="manydepth", manydepth_real_lookup=True,
        batch_size=2, compute_dtype="float32")
    trainer = HardeningTrainer(cfg, jax.random.PRNGKey(1), obj, mask,
                               teacher=teacher, steps_per_epoch=10)
    state = trainer.make_state()
    frames = {"0": jnp.asarray(make_scene(2, 96, 320, seed=2)),
              "-1": jnp.asarray(make_scene(2, 96, 320, seed=6)),
              "s": jnp.asarray(make_scene(2, 96, 320, seed=3))}
    # host copy: train_step donates the state buffers
    before = np.asarray(
        jax.tree_util.tree_leaves(state.params["depth"])[0])
    state, metrics = trainer.train_step(
        state, frames, jnp.ones((2,), bool), jnp.zeros((2,), bool),
        jnp.asarray(make_scene(2, 96, 320, seed=4)),
        jax.random.PRNGKey(5))
    after = np.asarray(
        jax.tree_util.tree_leaves(state.params["depth"])[0])
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["selfsup_loss"]))
    assert not np.allclose(before, after)

    # config validation
    with pytest.raises(ValueError):
        HardeningTrainer(
            HardeningConfig(
                selfsup=SelfSupConfig(height=H, width=W,
                                      frame_ids=("0", "s")),
                adv=AdvSynthConfig(ori_h=96, ori_w=320),
                model_family="manydepth", manydepth_real_lookup=True,
                batch_size=2),
            jax.random.PRNGKey(1), obj, mask, teacher=teacher)
