"""ICLR'23 hardening trainer — fully on-device, one XLA step.

Functional re-design of monodepth2/trainer.py:45-812. Per outer step the
reference runs three device<->host round trips (GPU texture attack ->
CPU copy -> DataLoader-worker compositing -> GPU batch); here texture
refresh, stereo-consistent synthesis, forward/backward and the optax
update are one jitted computation:

  1. texture refresh: re-optimize the shared adversarial texture against
     the *current* student on a KITTI-object scene batch
     (trainer.py:300-307 -> mono_dataset.py:178-184);
  2. synthesis: stereo-consistent adv/ben compositing at native
     resolution + resize to model resolution (adv_synth.py);
  3. losses (trainer.py:525-673):
       sup   = MSE(frozen teacher disp on benign composite, student disp)
               [or the --gt_depth pseudo-depth composite variant]
       contra= SimSiam(-cos) between encoder features of adv/ben views
       photo = min-reprojection (0.85*SSIM + 0.15*L1) + automask
               + edge-aware smoothness, averaged over 4 scales
  4. Adam on student params (+ SimSiam head, + pose nets when monocular),
     StepLR-equivalent staircase schedule (trainer.py:140-142).

Parallelism: batch data-parallel over a jax.sharding mesh — parameters
replicated, batch/scene inputs sharded on their leading axis; XLA inserts
the psum gradient reductions (the reference is single-GPU, my_utils.py:10).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..attacks.base import PhysObjAttackConfig
from ..attacks.pgd_object import PGDObjectAttack
from ..attacks.l0_object import L0ObjectAttack
from ..models.resnet import ResnetEncoder
from ..models.pose import PoseDecoder
from ..models.simsiam import SimSiam
from ..models.wrappers import MonodepthModel
from ..ops.geometry import disp_to_depth
from ..parallel.mesh import shard_batch, replicate
from ..physics.eot import TRAIN_DIST_RANGE, monodepth2_K
from .adv_synth import make_synth_compositor, stereo_T_batch, \
    synthesize_adv_batch
from .config import HardeningConfig
from .selfsup import compute_selfsup_losses
from ..ops.geometry import transformation_from_parameters


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _scaled_K(height: int, width: int):
    """Normalized Monodepth2 K scaled to model resolution, and its
    pseudo-inverse (mono_dataset.py:332-342)."""
    K = monodepth2_K(width=width, height=height)
    return K, np.linalg.pinv(K).astype(np.float32)


class HardeningTrainer:
    """Orchestrates the hardening recipe.

    teacher: optional (apply_fn, variables)-style DepthPredictor used for
    the supervised distillation branch (trainer.py:93-95 gt_model);
    required when cfg.supervised_adv.
    """

    def __init__(self, cfg: HardeningConfig, rng, obj_img, obj_mask,
                 teacher=None, steps_per_epoch: int = 1000,
                 mesh=None, init_variables: Optional[Dict] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.teacher = teacher
        if cfg.supervised_adv and teacher is None:
            raise ValueError("supervised_adv requires a frozen teacher")

        ss = cfg.selfsup
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.manydepth_real_lookup:
            if cfg.model_family != "manydepth":
                raise ValueError(
                    "manydepth_real_lookup requires "
                    "model_family='manydepth'")
            if not ss.use_pose_net:
                raise ValueError(
                    "manydepth_real_lookup needs monocular frame_ids "
                    "(a previous frame + pose net supply the lookup)")
        if cfg.model_family == "manydepth":
            from ..models.wrappers import ManyDepthTrainModel

            if cfg.s2d_stem or cfg.wpack_stem or cfg.wpack_stem8:
                raise ValueError(
                    "s2d_stem/wpack_stem apply to the plain ResNet "
                    "stem; the manydepth matching encoder has its own")
            self.model = ManyDepthTrainModel(
                num_layers=cfg.num_layers, scales=ss.scales,
                input_height=ss.height, input_width=ss.width,
                num_depth_bins=cfg.manydepth_num_depth_bins,
                dtype=dtype, fuse_upconv=cfg.fuse_upconv,
                packed_decoder=cfg.packed_decoder,
                wpack_decoder=cfg.wpack_decoder)
        else:
            self.model = MonodepthModel(num_layers=cfg.num_layers,
                                        scales=ss.scales, dtype=dtype,
                                        s2d_stem=cfg.s2d_stem,
                                        wpack_stem=cfg.wpack_stem,
                                        wpack_stem8=cfg.wpack_stem8,
                                        fuse_upconv=cfg.fuse_upconv,
                                        packed_decoder=cfg.packed_decoder,
                                        wpack_decoder=cfg.wpack_decoder)
        self.simsiam = SimSiam() if cfg.contrastive_learning else None
        self.use_pose = ss.use_pose_net
        if self.use_pose:
            self.pose_encoder = ResnetEncoder(num_layers=18,
                                              num_input_images=2)
            self.pose_decoder = PoseDecoder(num_input_features=1,
                                            num_frames_to_predict_for=2)

        self.obj_img = jnp.asarray(obj_img)
        self.obj_mask = jnp.asarray(obj_mask)
        oh, ow = self.obj_img.shape[1:3]
        self.synth_eot = make_synth_compositor(oh, ow, cfg.adv.ori_h,
                                               cfg.adv.ori_w)

        # attack on the student (trainer.py:224 set_adv_train(model2atk=
        # self.models["DepthModelWrapper"])), train-time distance range
        # (mono_dataset.py:149-158).
        # The attack objective and the attack-eval predictor consume
        # ONLY disp0 (phy_obj_atk.py:94), so the inner-loop passes run
        # a scales=(0,) clone that skips the scale-1..3 disparity
        # heads (+ their grads in the PGD loop). Exact — same
        # parameter tree, unused head params are ignored by apply.
        # fold_bn folds the eval-mode BNs into the conv kernels on the
        # attack/eval clones (exact, resnet._BNFold); the manydepth
        # matching encoder doesn't expose the flag.
        self._d0_kw = ({"fold_bn": cfg.fold_bn}
                       if cfg.model_family != "manydepth" else {})
        self.model_d0 = self.model.clone(scales=(0,), **self._d0_kw)

        def student_predict(variables, images):
            return self.model_d0.apply(variables, images, train=False)

        self._student_predict = student_predict
        atk_cfg = PhysObjAttackConfig(
            obj_h=oh, obj_w=ow,
            dist_range=tuple(float(x) for x in TRAIN_DIST_RANGE),
            scene_h=ss.height, scene_w=ss.width,
            ori_h=cfg.adv.ori_h, ori_w=cfg.adv.ori_w,
            tile_h=cfg.adv.tile_h, tile_w=cfg.adv.tile_w,
            attack_crop_w=cfg.adv.attack_crop_w,
            attack_crop_h=cfg.adv.attack_crop_h,
            attack_scale=cfg.adv.attack_scale,
            attack_scale_fine_steps=cfg.adv.attack_scale_fine_steps,
            attack_view_dtype=cfg.adv.attack_view_dtype)
        if cfg.adv.norm_type == "l_inf":
            self.attack = PGDObjectAttack(
                student_predict, obj_img, obj_mask, atk_cfg,
                eps=cfg.adv.epsilon, alpha=cfg.adv.alpha,
                steps=cfg.adv.steps)
        elif cfg.adv.norm_type == "l_0":
            self.attack = L0ObjectAttack(
                student_predict, obj_img, obj_mask, atk_cfg,
                adam_lr=cfg.adv.adam_lr, steps=cfg.adv.steps,
                mask_wt=cfg.adv.mask_wt, l0_thresh=cfg.adv.l0_thresh)
        else:
            raise ValueError(f"unknown norm_type {cfg.adv.norm_type}")
        if cfg.adv.attack_scale:
            sc = cfg.adv.attack_scale
            model_ds = self.model.clone(scales=(sc,), **self._d0_kw)

            def student_predict_scale(variables, images):
                _, outs = model_ds.apply(
                    variables, images, train=False,
                    method="features_and_disps")
                return outs[("disp", sc)]

            self.attack.predict_scale_fn = student_predict_scale

        K, inv_K = _scaled_K(ss.height, ss.width)
        self._K = jnp.asarray(K)
        self._inv_K = jnp.asarray(inv_K)

        # StepLR(step_size, 0.1) equivalent (trainer.py:141-142).
        schedule = optax.exponential_decay(
            init_value=cfg.learning_rate,
            transition_steps=steps_per_epoch * cfg.scheduler_step_size,
            decay_rate=cfg.scheduler_gamma, staircase=True)
        self.tx = optax.adam(schedule)

        # init_variables may be partial (e.g. {"depth": pretrained} for
        # --fine_tune, trainer.py:70-91): missing collections (simsiam /
        # pose nets) are freshly initialized and the given ones override.
        required = {"depth"}
        if self.simsiam is not None:
            required.add("simsiam")
        if self.use_pose:
            required.update(("pose_encoder", "pose_decoder"))
        if init_variables and required <= set(init_variables):
            self._variables = dict(init_variables)
        else:
            self._variables = self._init_variables(rng)
            if init_variables:
                self._variables.update(init_variables)
        from ..utils.compileopts import compiler_options

        copts = compiler_options()
        self._train_step = jax.jit(self._step, donate_argnums=(0,),
                                   compiler_options=copts)
        self._selfsup_step = jax.jit(self._plain_step, donate_argnums=(0,),
                                     compiler_options=copts)
        self._selfsup_frames_step = jax.jit(self._plain_frames_step,
                                            donate_argnums=(0,),
                                            compiler_options=copts)

    # -- init -----------------------------------------------------------------
    def _init_variables(self, rng):
        ss = self.cfg.selfsup
        keys = jax.random.split(rng, 4)
        dummy = jnp.zeros((1, ss.height, ss.width, 3), jnp.float32)
        v = {"depth": self.model.init(keys[0], dummy, train=False)}
        if self.simsiam is not None:
            feats = [jnp.zeros((1, ss.height // 32, ss.width // 32, 512))]
            v["simsiam"] = self.simsiam.init(keys[1], feats, feats,
                                             train=False)
        if self.use_pose:
            pair = jnp.zeros((1, ss.height, ss.width, 6), jnp.float32)
            v["pose_encoder"] = self.pose_encoder.init(keys[2], pair,
                                                       train=False)
            pf = self.pose_encoder.apply(v["pose_encoder"], pair,
                                         train=False)
            v["pose_decoder"] = self.pose_decoder.init(keys[3], [pf])
        return v

    def make_state(self) -> TrainState:
        # deep-copy: the donated train step must not free the caller's
        # arrays (the teacher shares them under --fine-tune; see
        # DistillTrainer.make_state)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        params = {k: copy(v["params"])
                  for k, v in self._variables.items()}
        batch_stats = {k: copy(v.get("batch_stats", {}))
                       for k, v in self._variables.items()}
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=self.tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def student_variables(self, state: TrainState):
        return {"params": state.params["depth"],
                "batch_stats": state.batch_stats["depth"]}

    # -- loss -----------------------------------------------------------------
    def _losses(self, params, batch_stats, batch, rng):
        cfg = self.cfg
        ss = cfg.selfsup
        new_bs = dict(batch_stats)
        metrics = {}

        v = {"params": params["depth"],
             "batch_stats": batch_stats["depth"]}
        poses = None
        lookup = rel_poses = None
        if cfg.manydepth_real_lookup:
            # beyond-reference: cost volume from the real previous
            # frame + pose-net pose (the reference zeroes lookups,
            # manydepth2/trainer.py:345-386). Poses come first so the
            # depth forward can consume them; attacks/eval stay
            # single-frame (no temporal context at attack time).
            poses, new_bs = self._predict_poses_mutable(
                params, new_bs, batch["color_aug"])
            fid = ss.temporal_source_ids[0]
            lookup = batch["color_aug"][fid][:, None]
            rel_poses = poses[fid][:, None]
            (feats_aug, outs), mut = self.model.apply(
                v, batch["color_aug"]["0"], lookup, rel_poses,
                train=True, mutable=["batch_stats"],
                method="features_and_disps_multi")
        else:
            (feats_aug, outs), mut = self.model.apply(
                v, batch["color_aug"]["0"], train=True,
                mutable=["batch_stats"],
                method="features_and_disps")
        new_bs["depth"] = mut["batch_stats"]
        disps = {s: outs[("disp", s)] for s in ss.scales}

        total = 0.0
        if cfg.supervised_adv:
            disp_gt = jax.lax.stop_gradient(
                self.teacher.apply_fn(self.teacher.variables,
                                      batch["color_ben"]))
            if cfg.gt_depth:
                # pseudo-depth composited with the object's true distance
                # inside its mask (trainer.py:551-558)
                pred_d = jnp.clip(disp_to_depth(
                    disps[0], ss.min_depth, ss.max_depth)[1] * 5.4,
                    1e-3, 80.0)
                pseudo_d = jnp.clip(disp_to_depth(
                    disp_gt, ss.min_depth, ss.max_depth)[1] * 5.4,
                    1e-3, 80.0)
                objmask = batch["objmask"]
                objdepth = batch["objdepth"].reshape(-1, 1, 1, 1)
                gt_d = objmask * objdepth + pseudo_d * (1.0 - objmask)
                loss_sup = jnp.mean((gt_d - pred_d) ** 2)
            else:
                loss_sup = jnp.mean((disp_gt - disps[0]) ** 2)
            loss_sup = cfg.sup_loss_wt * loss_sup
            metrics["sup_loss"] = loss_sup
            total = total + loss_sup

        if cfg.contrastive_learning:
            v2 = {"params": params["depth"],
                  "batch_stats": new_bs["depth"]}
            if cfg.manydepth_real_lookup:
                # same encode path as the adversarial view (the
                # temporal planes are benign in both views)
                feats_ben, mut2 = self.model.apply(
                    v2, batch["color_ben"], lookup, rel_poses,
                    train=True, mutable=["batch_stats"],
                    method="encode_multi")
            else:
                feats_ben, mut2 = self.model.apply(
                    v2, batch["color_ben"], train=True,
                    mutable=["batch_stats"], method="encode")
            new_bs["depth"] = mut2["batch_stats"]
            vss = {"params": params["simsiam"],
                   "batch_stats": batch_stats["simsiam"]}
            contras, mut3 = self.simsiam.apply(
                vss, feats_aug, feats_ben, train=True,
                mutable=["batch_stats"])
            new_bs["simsiam"] = mut3["batch_stats"]
            contras = cfg.contras_loss_wt * contras
            metrics["contras_loss"] = contras
            total = total + contras

        if not cfg.no_original_train:
            if poses is None:
                poses = {}
                if self.use_pose:
                    poses, new_bs = self._predict_poses_mutable(
                        params, new_bs, batch["color_aug"])
            if cfg.use_depth_hints:
                from .depth_hints import compute_depth_hints_losses

                selfsup, aux = compute_depth_hints_losses(
                    disps, batch, poses, rng, ss)
            else:
                selfsup, aux = compute_selfsup_losses(
                    disps, batch, poses, rng, ss)
            metrics["selfsup_loss"] = selfsup
            total = total + selfsup

        metrics["loss"] = total
        return total, (new_bs, metrics)

    def _predict_poses_mutable(self, params, batch_stats, color_aug):
        """Pose nets in train mode with threaded batch stats
        (trainer.py:377-433, separate_resnet)."""
        poses = {}
        bs = dict(batch_stats)
        for fid in self.cfg.selfsup.temporal_source_ids:
            f = int(fid)
            if f < 0:
                pair = jnp.concatenate([color_aug[fid], color_aug["0"]],
                                       axis=-1)
            else:
                pair = jnp.concatenate([color_aug["0"], color_aug[fid]],
                                       axis=-1)
            pv = {"params": params["pose_encoder"],
                  "batch_stats": bs["pose_encoder"]}
            feats, mut = self.pose_encoder.apply(
                pv, pair, train=True, mutable=["batch_stats"])
            bs["pose_encoder"] = mut["batch_stats"]
            axisangle, translation = self.pose_decoder.apply(
                {"params": params["pose_decoder"]}, [feats])
            poses[fid] = transformation_from_parameters(
                axisangle[:, 0], translation[:, 0], invert=(f < 0))
        return poses, bs

    # -- steps ----------------------------------------------------------------
    def _apply_grads(self, state, grads, new_bs, metrics):
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, batch_stats=new_bs,
                          opt_state=new_opt, step=state.step + 1), metrics

    def _step(self, state, frames, side_is_l, do_flip, scene_imgs, rng):
        """One hardening step: texture refresh -> synth -> update."""
        k_atk, k_synth, k_loss = jax.random.split(rng, 3)
        student = self.student_variables(state)
        obj_adv = self.attack._optimize(
            student, self.attack._replicate(
                scene_imgs, self.cfg.adv.attack_batch_size), k_atk)

        batch = synthesize_adv_batch(
            self.synth_eot, frames, obj_adv, self.obj_img, self.obj_mask,
            side_is_l, do_flip, k_synth, self.cfg.selfsup, self.cfg.adv)
        batch["K"] = jnp.broadcast_to(self._K, (frames["0"].shape[0], 4, 4))
        batch["inv_K"] = jnp.broadcast_to(self._inv_K,
                                          (frames["0"].shape[0], 4, 4))
        batch["stereo_T"] = stereo_T_batch(side_is_l, do_flip)
        # DepthHints planes ride along at model resolution (loader
        # applies the item's flip before batching)
        for k in ("depth_hint", "depth_hint_mask"):
            if k in frames:
                batch[k] = frames[k]

        grads, (new_bs, metrics) = jax.grad(
            self._losses, has_aux=True)(state.params, state.batch_stats,
                                        batch, k_loss)
        return self._apply_grads(state, grads, new_bs, metrics)

    def _plain_step(self, state, batch, rng):
        """Non-adversarial self-supervised step (plain Monodepth2
        training; batch must carry color/color_aug/K/inv_K/stereo_T)."""
        grads, (new_bs, metrics) = jax.grad(
            self._losses, has_aux=True)(state.params, state.batch_stats,
                                        batch, rng)
        return self._apply_grads(state, grads, new_bs, metrics)

    def _plain_frames_step(self, state, frames, side_is_l, do_flip,
                           rng):
        """Plain self-supervised step straight from raw native-res
        frames: resize/flip/jitter batch building happens on device
        (the vanilla Monodepth2 trainer with adv_train=False;
        supervised_adv/contrastive_learning should be off)."""
        from .adv_synth import build_plain_batch

        k_b, k_loss = jax.random.split(rng)
        batch = build_plain_batch(frames, side_is_l, do_flip, k_b,
                                  self.cfg.selfsup,
                                  color_aug=self.cfg.adv.color_aug)
        B = frames["0"].shape[0]
        batch["K"] = jnp.broadcast_to(self._K, (B, 4, 4))
        batch["inv_K"] = jnp.broadcast_to(self._inv_K, (B, 4, 4))
        grads, (new_bs, metrics) = jax.grad(
            self._losses, has_aux=True)(state.params, state.batch_stats,
                                        batch, k_loss)
        return self._apply_grads(state, grads, new_bs, metrics)

    def selfsup_frames_step(self, state, frames, side_is_l, do_flip,
                            rng):
        if self.mesh is not None:
            frames = shard_batch(frames, self.mesh)
        return self._selfsup_frames_step(state, frames, side_is_l,
                                         do_flip, rng)

    # -- public ---------------------------------------------------------------
    def train_step(self, state, frames, side_is_l, do_flip, scene_imgs,
                   rng):
        if self.mesh is not None:
            frames = shard_batch(frames, self.mesh)
            scene_imgs = shard_batch(scene_imgs, self.mesh)
        return self._train_step(state, frames, side_is_l, do_flip,
                                scene_imgs, rng)

    def selfsup_step(self, state, batch, rng):
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return self._selfsup_step(state, batch, rng)

    def default_eval_cfg(self, **overrides):
        """AttackEvalConfig mirroring the training attack's own
        hyperparameters (trainer.py:455-465 val() args)."""
        from ..evaluation.attack_eval import AttackEvalConfig

        ss = self.cfg.selfsup
        return AttackEvalConfig(
            norm_type=self.cfg.adv.norm_type,
            epsilon=self.cfg.adv.epsilon,
            alpha=self.cfg.adv.alpha,
            step=self.cfg.adv.steps,
            adam_lr=self.cfg.adv.adam_lr,
            mask_wt=self.cfg.adv.mask_wt,
            l0_thresh=self.cfg.adv.l0_thresh,
            obj_name=self.cfg.adv.obj_name,
            batch_size=self.cfg.adv.attack_batch_size,
            scene_h=ss.height, scene_w=ss.width,
            ori_h=self.cfg.adv.ori_h, ori_w=self.cfg.adv.ori_w,
            **overrides)

    def evaluate_attacks(self, state, scenes_iter, eval_cfg=None,
                         rng=None):
        """Periodic robustness check on the in-training student
        (trainer.py:435-470 val() -> evaluate_attacks with the training
        attack's own hyperparameters). The attack instance is cached
        per-config so repeat evaluations reuse its jit cache (the attack
        inner loop is the most expensive compile in the codebase)."""
        from ..evaluation.attack_eval import build_attack, evaluate_attacks
        from ..models.wrappers import DepthPredictor

        if eval_cfg is None:
            eval_cfg = self.default_eval_cfg()
        cache = getattr(self, "_eval_attacks", None)
        if cache is None:
            cache = self._eval_attacks = {}
        attack = cache.get(eval_cfg)
        if attack is None:
            attack = cache[eval_cfg] = build_attack(
                eval_cfg, self._student_predict, self.obj_img,
                self.obj_mask)
        predictor = DepthPredictor(apply_fn=self._student_predict,
                                   variables=self.student_variables(state))
        return evaluate_attacks(predictor, attack, scenes_iter,
                                eval_cfg, rng=rng)
