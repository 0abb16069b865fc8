"""Distillation-only adversarial hardening (simple_adv_training.py).

Per step (simple_adv_training.py:126-141): run the configured attack
against the *student* on a KITTI-object scene batch, take the frozen
original model's disparity on the benign composites as pseudo ground
truth, and train the student with MSE on the adversarial composites
(Adam, lr 1e-4, simple_adv_training.py:115).

The student runs in train mode (model_rob.train(), :125) so BatchNorm
uses batch statistics and updates running stats; the attack and the
teacher always run in eval mode (attack.py:296-320, :98).

The whole step — attack inner loop included — is one jitted computation;
under a mesh it is batch-parallel with replicated params.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..attacks.base import PhysObjAttackConfig
from ..attacks.l0_object import L0ObjectAttack
from ..attacks.pgd_image import PGDImageAttack
from ..attacks.pgd_object import PGDObjectAttack
from ..models.wrappers import MonodepthModel
from ..parallel.mesh import replicate, shard_batch
from ..physics.eot import EVAL_DIST_RANGE
from .config import DistillConfig


@flax.struct.dataclass
class DistillState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def build_attack(cfg: DistillConfig, predict_fn, obj_img, obj_mask):
    """get_atk_model equivalent (simple_adv_training.py:38-56)."""
    if cfg.adv_type == "image":
        return PGDImageAttack(predict_fn, eps=cfg.epsilon,
                              alpha=cfg.alpha, steps=cfg.steps,
                              scene_hw=(cfg.scene_h, cfg.scene_w))
    oh, ow = obj_img.shape[1:3]
    atk_cfg = PhysObjAttackConfig(
        obj_h=oh, obj_w=ow,
        dist_range=tuple(float(x) for x in EVAL_DIST_RANGE),
        scene_h=cfg.scene_h, scene_w=cfg.scene_w,
        ori_h=cfg.ori_h, ori_w=cfg.ori_w,
        eval_pin_z0=6.1 if cfg.adv_type == "object_l0" else 7.0,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        attack_crop_w=cfg.attack_crop_w,
        attack_crop_h=cfg.attack_crop_h,
        attack_scale=cfg.attack_scale,
        attack_scale_fine_steps=cfg.attack_scale_fine_steps,
        attack_view_dtype=cfg.attack_view_dtype)
    if cfg.adv_type == "object":
        return PGDObjectAttack(predict_fn, obj_img, obj_mask, atk_cfg,
                               eps=cfg.epsilon, alpha=cfg.alpha,
                               steps=cfg.steps)
    if cfg.adv_type == "object_l0":
        return L0ObjectAttack(predict_fn, obj_img, obj_mask, atk_cfg,
                              adam_lr=cfg.adam_lr, steps=cfg.steps,
                              mask_wt=cfg.mask_wt,
                              l0_thresh=cfg.l0_thresh)
    raise ValueError(f"unknown adv_type {cfg.adv_type}")


class DistillTrainer:
    """do_adv_training equivalent (simple_adv_training.py:96-156).

    teacher: DepthPredictor (frozen). The student is attacked with its
    own current parameters each step (the attack holds the student
    module, not a snapshot — get_atk_model(model_rob), :116).
    """

    def __init__(self, cfg: DistillConfig, rng, obj_img, obj_mask,
                 teacher, mesh=None, num_layers: int = 18,
                 init_variables: Optional[dict] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.teacher = teacher
        kw = dict(num_layers=num_layers,
                  dtype=jnp.dtype(cfg.compute_dtype),
                  s2d_stem=cfg.s2d_stem,
                  wpack_stem=cfg.wpack_stem,
                  wpack_stem8=cfg.wpack_stem8,
                  fuse_upconv=cfg.fuse_upconv,
                  packed_decoder=cfg.packed_decoder,
                  wpack_decoder=cfg.wpack_decoder)
        self.model = MonodepthModel(**kw)
        # Every model pass in the distill step consumes ONLY disp0
        # (attack objective phy_obj_atk.py:94; distill MSE
        # simple_adv_training.py:133-137), so all applies run through a
        # scales=(0,) twin that skips the scale-1..3 disparity heads
        # (+ their grads). Exact: the unused heads see zero gradients
        # in the reference too (torch leaves .grad None; our Adam
        # update of a zero grad is 0), and flax ignores the extra
        # params in the full tree. `self.model` keeps the full head
        # set for init/checkpoints. The attack/eval clone additionally
        # folds the eval-mode BNs into its conv kernels (exact,
        # resnet._BNFold): one elementwise HBM pass less per BN per
        # PGD fwd+bwd.
        self.model_d0 = MonodepthModel(scales=(0,),
                                       fold_bn=cfg.fold_bn, **kw)

        def student_predict(variables, images):
            return self.model_d0.apply(variables, images, train=False)

        self.attack = build_attack(cfg, student_predict,
                                   jnp.asarray(obj_img),
                                   jnp.asarray(obj_mask))
        if cfg.attack_scale and cfg.adv_type != "image":
            s = cfg.attack_scale
            model_ds = MonodepthModel(scales=(s,),
                                      fold_bn=cfg.fold_bn, **kw)

            def student_predict_scale(variables, images):
                _, outs = model_ds.apply(
                    variables, images, train=False,
                    method="features_and_disps")
                return outs[("disp", s)]

            self.attack.predict_scale_fn = student_predict_scale
        self.tx = optax.adam(cfg.learning_rate)

        if init_variables is None:
            dummy = jnp.zeros((1, cfg.scene_h, cfg.scene_w, 3), jnp.float32)
            init_variables = self.model.init(rng, dummy, train=False)
        self._variables = init_variables
        from ..utils.compileopts import compiler_options

        self._train_step = jax.jit(self._step, donate_argnums=(0,),
                                   compiler_options=compiler_options())

    def make_state(self) -> DistillState:
        # deep-copy: train_step donates the state, and aliasing the
        # caller's arrays would free them on the first step — the
        # frozen teacher typically SHARES the pretrained arrays
        # (init_variables=teacher variables), which then die under it
        # on TPU (donation is a no-op on CPU, so only hardware runs
        # hit this).
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        state = DistillState(
            params=copy(self._variables["params"]),
            batch_stats=copy(self._variables.get("batch_stats", {})),
            opt_state=self.tx.init(self._variables["params"]),
            step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def student_variables(self, state):
        return {"params": state.params, "batch_stats": state.batch_stats}

    def _step(self, state, scenes, rng):
        student = self.student_variables(state)
        if self.cfg.adv_type == "image":
            adv, ben = self.attack._run(student, scenes, rng)
        else:
            adv, ben, _, _ = self.attack._run(
                student, scenes, rng, batch_size=self.cfg.batch_size,
                eval_mode=False)

        disp_gt = jax.lax.stop_gradient(
            self.teacher.apply_fn(self.teacher.variables, ben))

        def loss_fn(params, batch_stats):
            v = {"params": params, "batch_stats": batch_stats}
            pred, mut = self.model_d0.apply(v, adv, train=True,
                                            mutable=["batch_stats"])
            return jnp.mean((disp_gt - pred) ** 2), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = DistillState(params=new_params, batch_stats=new_bs,
                                 opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss}

    def train_step(self, state, scenes, rng):
        if self.mesh is not None:
            scenes = shard_batch(scenes, self.mesh)
        return self._train_step(state, scenes, rng)


def eval_atk_perf(trainer: DistillTrainer, state, scenes_iter, rng,
                  logger=None, epoch: int = 0):
    """Per-epoch robustness check (simple_adv_training.py:59-94).

    For eval scene batches: attack the in-training student (eval-pinned
    EoT sample), then measure
      model_perf: mean |depth(student(ben)) - depth(teacher(ben))|
                  (lower = student tracks the frozen teacher), and
      atk_perf:   mean |depth(student(adv)) - depth(teacher(ben))|
                  inside the object mask (higher = attack still works).
    Logs 6-panel comparison images for the first batch like the
    reference's eval/model_comp + eval/atk_comp TB panels.
    Returns (model_perf, atk_perf).
    """
    import numpy as np

    from ..ops.metrics import get_mean_depth_diff

    student = trainer.student_variables(state)
    teacher = trainer.teacher
    model_acc, atk_acc, n = 0.0, 0.0, 0
    for i, scenes in enumerate(scenes_iter):
        k = jax.random.fold_in(rng, i)
        scenes = jnp.asarray(scenes)
        if trainer.cfg.adv_type == "image":
            adv, ben = trainer.attack(student, scenes, k)
            masks = None
        else:
            adv, ben, masks, _ = trainer.attack(
                student, scenes, trainer.cfg.batch_size, k,
                eval_mode=True)
        disp_gt = teacher.apply_fn(teacher.variables, ben)
        disp_pre = trainer.model_d0.apply(student, ben, train=False)
        disp_atk = trainer.model_d0.apply(student, adv, train=False)
        if i == 0 and logger is not None:
            from ..utils.visualize import eval_depth_diff

            ben0 = np.asarray(ben[0], np.float32)
            adv0 = np.asarray(adv[0], np.float32)
            img_model, _, _ = eval_depth_diff(
                ben0, ben0, disp1=np.asarray(disp_pre)[0, ..., 0],
                disp2=np.asarray(disp_gt)[0, ..., 0])
            img_atk, _, _ = eval_depth_diff(
                adv0, ben0, disp1=np.asarray(disp_atk)[0, ..., 0],
                disp2=np.asarray(disp_gt)[0, ..., 0])
            logger.log_image(epoch, "eval/model_comp",
                             np.asarray(img_model))
            logger.log_image(epoch, "eval/atk_comp", np.asarray(img_atk))
        model_acc += float(get_mean_depth_diff(disp_pre, disp_gt,
                                               None, use_abs=True))
        atk_acc += float(get_mean_depth_diff(disp_atk, disp_gt,
                                             masks, use_abs=True))
        n += 1
    n = max(n, 1)
    return model_acc / n, atk_acc / n
