"""Shared machinery for physical-object depth attacks.

Reference: torchattacks/attack.py:5-320 (base class) plus the common
pattern of the Phy_obj_atk* family (e.g. phy_obj_atk.py:59-123):

  1. replicate a single 1242x375 scene to the attack batch (or accept a
     full batch),
  2. run an optimization loop over the object texture, each step
     re-projecting with fresh EoT samples, compositing, resizing to
     1024x320 and differentiating a targeted zero-disparity MSE masked by
     the object,
  3. produce final (adv_scenes, ben_scenes, obj_masks, obj_img_adv) with
     one last EoT sample — pinned to (z0, alpha) = (7 or 6.1, 0) for
     sample 0 in eval mode — where the *benign* composite reuses the
     adversarial projection's masks (phy_obj_atk.py:114-121).

TPU design: the whole loop is a single jitted computation (lax.fori_loop /
lax.while_loop); the model is applied with BatchNorm running statistics
(the reference forces eval() during attacks, attack.py:296-320). Model
variables are traced arguments so hardening can re-attack with fresh
parameters without recompiling.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize
from ..physics.calibration import Calibration
from ..physics.eot import (
    ANGLE_RANGE, EVAL_DIST_RANGE, EoTCompositor, EoTConfig, ORI_H, ORI_W,
)

SCENE_H, SCENE_W = 320, 1024  # model input (phy_obj_atk.py:50)


@dataclasses.dataclass(frozen=True)
class PhysObjAttackConfig:
    """Static attack configuration shared by the family."""

    obj_h: int
    obj_w: int
    dist_range: Tuple[float, ...] = tuple(float(x) for x in EVAL_DIST_RANGE)
    angle_range: Tuple[float, ...] = tuple(float(x) for x in ANGLE_RANGE)
    eval_pin_z0: float = 7.0  # 6.1 for the L0 attack (phy_obj_atk_l0.py:162)
    eval_pin_alpha: float = 0.0
    scene_h: int = SCENE_H
    scene_w: int = SCENE_W
    ori_h: int = ORI_H
    ori_w: int = ORI_W
    # metric quad size; per-vehicle values in physics.eot.VEHICLE_SIZES
    # (physicalTrans.py:35-48)
    veh_h: float = 1.6
    veh_w: float = 1.82
    projection: Optional[np.ndarray] = None  # default: KITTI calib P2
    # Inner-loop model view: False (default) warps directly at model
    # resolution inside a tile around the quad (sub-pixel-different,
    # ~7x fewer gather/scatter elements); True reproduces the exact
    # warp-at-native-then-resize chain (phy_obj_atk.py:83-90). Final
    # composites always use the exact path.
    exact_composite: bool = False
    tile_h: int = 256
    tile_w: int = 256
    # texture-gradient adjoint for the tiled path: "separable"
    # (default: exact two-pass warp, MXU pass 1 + Pallas pass 2 with an
    # exact mirrored-kernel adjoint) | "approx" (continuous adjoint) |
    # "exact" | "scatter" (autodiff) on the 2-D gather sampler
    adjoint_mode: str = "separable"
    # Inner-loop model crop: when set (e.g. 512), the attack objective
    # runs the depth model on a width-cropped window centered on the
    # object instead of the full scene_w frame — the targeted MSE only
    # reads disparities inside the object mask, and the model's
    # effective receptive field is covered by the >=(crop-tile)/2 px
    # of kept context, so the gradient signal is near-identical at
    # roughly scene_w/crop the model cost. None reproduces the
    # reference full-frame objective (phy_obj_atk.py:83-94). Final
    # composites and the hardening train step are never cropped.
    attack_crop_w: Optional[int] = None
    # Optional vertical companion to attack_crop_w: crop rows to this
    # height centered on the object mask (the quad is <=~230 px tall at
    # z0 >= 5 m vs the 320-px frame). Same semantics/rescaling.
    attack_crop_h: Optional[int] = None
    # Inner-loop objective from the scale-s disparity head instead of
    # disp0 (0 = reference full-resolution objective). The Monodepth2
    # decoder's multi-scale heads predict the same disparity at
    # 1/2^s resolution, so the targeted MSE read from ("disp", s)
    # carries near-identical texture gradients while XLA dead-code
    # eliminates the decoder's /1-scale stages (upconv0_0/0_1 +
    # dispconv0 — the three most expensive convs) from every PGD
    # fwd+bwd. Requires the trainer to supply predict_scale_fn.
    # Finals, training losses and eval always use disp0.
    attack_scale: int = 0
    # Coarse-to-fine schedule: when attack_scale > 0, the LAST k inner
    # steps read the reference disp0 objective so the texture's final
    # refinements align with the true full-resolution objective (the
    # pure coarse objective measured ~7% weaker at scale 1 on the
    # equivalence suite; the fine tail recovers it —
    # docs/FIDELITY.md). Ignored when attack_scale == 0.
    attack_scale_fine_steps: int = 1
    # Compute dtype of the PGD-loop model VIEW (warp + composite +
    # relocation einsums + scene-window gather) on the fused cropped
    # path. The model body already runs in its own compute dtype;
    # "bfloat16" moves the f32->bf16 boundary from the model input to
    # the warp input, halving the view's HBM traffic and running the
    # pass-1/relocation einsums at MXU bf16 rate. The targeted cost is
    # still reduced in f32. Finals, training losses, and eval are
    # NEVER affected (they use the exact/full-frame paths). Deviation
    # is tabled in docs/FIDELITY.md; default keeps the reference f32.
    attack_view_dtype: str = "float32"

    def __post_init__(self):
        if self.attack_scale not in (0, 1, 2):
            raise ValueError("attack_scale must be 0, 1 or 2")
        if self.attack_view_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "attack_view_dtype must be 'float32' or 'bfloat16', "
                f"got {self.attack_view_dtype!r}")
        if self.attack_scale_fine_steps < 0:
            raise ValueError("attack_scale_fine_steps must be >= 0")
        for name, crop, full, tile in (
                ("attack_crop_w", self.attack_crop_w, self.scene_w,
                 self.tile_w),
                ("attack_crop_h", self.attack_crop_h, self.scene_h,
                 self.tile_h)):
            if crop is not None and crop < full:
                # the crop must contain the object tile or the rescaled
                # cost no longer matches the full-frame objective
                if crop < min(tile, full):
                    raise ValueError(
                        f"{name}={crop} is smaller than the object "
                        f"tile ({tile}); the mask would be truncated")
                if crop % 32:
                    raise ValueError(
                        f"{name}={crop} must be a multiple of 32 "
                        "(encoder downsamples 5x by 2)")

    def make_eot(self) -> EoTCompositor:
        P = self.projection
        if P is None:
            # The attack family projects through the dataset calibration
            # (phy_obj_atk.py:53-56), which divides without epsilon
            # (kitti_util.py:139-147). For reduced-resolution scenes
            # (tests/dryruns) the calib is scaled so the quad still
            # lands in-frame; at native 1242x375 this is a no-op.
            P = Calibration.default().P.astype(np.float32).copy()
            P[0] *= self.ori_w / ORI_W
            P[1] *= self.ori_h / ORI_H
            eps = 0.0
        else:
            eps = 1e-7
        return EoTCompositor(EoTConfig(
            obj_h=self.obj_h, obj_w=self.obj_w, scene_h=self.ori_h,
            scene_w=self.ori_w, veh_h=self.veh_h, veh_w=self.veh_w,
            projection=np.asarray(P, np.float32), proj_eps=eps))


class PhysObjAttack:
    """Base class; subclasses implement `_optimize(...)`.

    Usage:
        atk = SomeAttack(predict_fn, obj_img, obj_mask, cfg, ...)
        adv, ben, masks, obj_adv = atk(variables, scenes, batch, rng,
                                       eval_mode=False)

    predict_fn(variables, images_1024x320_nhwc) -> disp (B, 320, 1024, 1),
    always eval-mode (running BN stats).
    """

    def __init__(self, predict_fn: Callable, obj_img, obj_mask,
                 cfg: PhysObjAttackConfig):
        self.predict_fn = predict_fn
        self.obj_img = jnp.asarray(obj_img)
        self.obj_mask = jnp.asarray(obj_mask)
        self.cfg = cfg
        self.eot = cfg.make_eot()
        self._jitted = {}
        # Static proof that the banded pallas_warp kernels cover this
        # attack's geometry — swept once here (eagerly: jit staging
        # would turn the bool into a tracer) from the static dist/angle
        # ranges + eval pins, and passed to every separable-warp call
        # so the runtime dense-fallback cond compiles away
        # (ops/pallas_warp.py).
        extra_z0, extra_alpha = self._band_sweep_extra()
        self._bands_fit: bool = self.eot.check_bands_fit(
            cfg.dist_range, cfg.angle_range, cfg.scene_h, cfg.scene_w,
            min(cfg.tile_h, cfg.scene_h), min(cfg.tile_w, cfg.scene_w),
            extra_z0=(cfg.eval_pin_z0,) + tuple(extra_z0),
            extra_alpha=(cfg.eval_pin_alpha,) + tuple(extra_alpha))
        # (variables, images) -> ("disp", cfg.attack_scale); assigned by
        # the trainer when cfg.attack_scale > 0 (the plain predict_fn
        # contract is disp0-only)
        self.predict_scale_fn: Optional[Callable] = None

    # -- common pieces --------------------------------------------------------
    def _replicate(self, scenes, batch_size: int):
        if scenes.shape[0] == 1:
            return jnp.broadcast_to(
                scenes, (batch_size,) + scenes.shape[1:])
        if scenes.shape[0] != batch_size:
            raise ValueError("Batch size doesn't match!")
        return scenes

    def _sample_za(self, rng, batch: int):
        """random.sample semantics (phy_obj_atk.py:108-109) — without
        replacement while the batch fits the population (the reference
        crashes beyond it; we degrade to with-replacement so batches
        larger than the 13-value ranges still work)."""
        kz, ka = jax.random.split(rng)
        dist = jnp.asarray(self.cfg.dist_range, jnp.float32)
        ang = jnp.asarray(self.cfg.angle_range, jnp.float32)
        z = jax.random.choice(kz, dist, shape=(batch,),
                              replace=batch > dist.shape[0])
        a = jax.random.choice(ka, ang, shape=(batch,),
                              replace=batch > ang.shape[0])
        return z, a

    def _model_view(self, scenes_full, obj_adv, z0s, alphas):
        """One EoT step -> (adv_scenes, masks) at model resolution.

        Exact path: composite at native res, resize (phy_obj_atk.py:83-90).
        Fast path (default): tiled warp straight to model res; the
        resize(scenes) it needs is loop-invariant so XLA hoists it out
        of the attack loop."""
        if self.cfg.exact_composite:
            adv_full, mask_full = self.eot.project_and_composite(
                scenes_full, obj_adv, self.obj_mask, z0s, alphas)
            adv = bilinear_resize(adv_full, self.cfg.scene_h,
                                  self.cfg.scene_w)
            mask = bilinear_resize(mask_full, self.cfg.scene_h,
                                   self.cfg.scene_w)
            return adv, mask
        scenes_model = bilinear_resize(scenes_full, self.cfg.scene_h,
                                       self.cfg.scene_w)
        return self.eot.composite_tiled_model(
            scenes_model, obj_adv, self.obj_mask, z0s, alphas,
            model_h=self.cfg.scene_h, model_w=self.cfg.scene_w,
            tile_h=min(self.cfg.tile_h, self.cfg.scene_h),
            tile_w=min(self.cfg.tile_w, self.cfg.scene_w),
            adjoint_mode=self.cfg.adjoint_mode,
            bands_fit=self._bands_fit)

    def _objective(self, variables, scenes_full, obj_adv, z0s, alphas,
                   fine: bool = False,
                   transform: Optional[Callable] = None):
        """The inner-loop cost: EoT view + targeted masked-disparity
        MSE, shared by every object attack's optimization loop.

        When the cropped objective is active on the (default) tiled
        separable composite and no full-frame scene transform is
        requested, this routes to the FUSED crop path
        (_model_view_cropped): the composite is evaluated directly
        inside the (crop_h, crop_w) window, so no full-frame tensor
        enters the differentiated graph — the paste-then-crop chain
        otherwise lowers to a batched gather whose transpose is a
        full-frame scatter-add, the single most expensive HLO of the
        bench step (~31 ms of a 452 ms step, scripts/profile_step.py).
        Bit-identical to paste-then-crop: the composite is pixelwise
        and the one-hot relocation moves values exactly.

        `transform` (e.g. the L0 attack's color jitter) is applied to
        the full-frame adv scenes and forces the reference path —
        global-statistic transforms do not commute with the crop.
        """
        cfg = self.cfg
        cw, ch = cfg.attack_crop_w, cfg.attack_crop_h
        cw = cw if cw is not None and cw < cfg.scene_w else None
        ch = ch if ch is not None and ch < cfg.scene_h else None
        if ((cw is not None or ch is not None) and transform is None
                and not cfg.exact_composite
                and cfg.adjoint_mode == "separable"):
            adv, masks, scale = self._model_view_cropped(
                scenes_full, obj_adv, z0s, alphas,
                cw or cfg.scene_w, ch or cfg.scene_h)
            return self._cost_tail(variables, adv, masks, scale, fine)
        adv_scenes, masks = self._model_view(scenes_full, obj_adv,
                                             z0s, alphas)
        if transform is not None:
            adv_scenes = transform(adv_scenes)
        return self._targeted_cost(variables, adv_scenes, masks,
                                   fine=fine)

    def _model_view_cropped(self, scenes_full, obj_adv, z0s, alphas,
                            cw: int, ch: int):
        """(adv_crop, mask_crop, scale): the tiled separable composite
        evaluated directly inside the objective window.

        The warped tile is relocated into crop coordinates by two
        one-hot einsums (exact 0/1 weights, one term per output pixel
        — MXU work with an equally cheap transpose), and the benign
        scene window is a constant gather carrying no gradient. Crop
        offsets reproduce _crop_to_object exactly: the full-frame mask
        is zero outside the tile, so its center of mass equals
        tile_offset + center-of-mass(tile mask)."""
        cfg = self.cfg
        Hm, Wm = cfg.scene_h, cfg.scene_w
        scenes_model = bilinear_resize(scenes_full, Hm, Wm)
        dt = jnp.dtype(cfg.attack_view_dtype)
        scenes_model = scenes_model.astype(dt)
        th = min(cfg.tile_h, Hm)
        tw = min(cfg.tile_w, Wm)
        if obj_adv.ndim == 3:
            obj_adv = obj_adv[None]
        tiles, y0s, x0s = self.eot.tiles_separable(
            (obj_adv,), self.obj_mask, z0s, alphas, Hm, Wm, th, tw,
            dtype=dt, bands_fit=self._bands_fit)
        m_t = tiles[..., -1:]

        # crop offsets == _crop_to_object on the pasted full frame
        msum = jnp.sum(m_t, axis=(1, 2, 3))
        has = msum > 0
        denom = jnp.maximum(msum, 1e-6)
        ty = jnp.arange(th, dtype=jnp.float32)
        tx = jnp.arange(tw, dtype=jnp.float32)
        cy = jnp.where(
            has, y0s + jnp.sum(m_t[..., 0] * ty[None, :, None],
                               axis=(1, 2)) / denom, Hm / 2.0)
        cx = jnp.where(
            has, x0s + jnp.sum(m_t[..., 0] * tx[None, None, :],
                               axis=(1, 2)) / denom, Wm / 2.0)
        y0c = jax.lax.stop_gradient(jnp.clip(
            jnp.round(cy - ch / 2).astype(jnp.int32), 0, Hm - ch))
        x0c = jax.lax.stop_gradient(jnp.clip(
            jnp.round(cx - cw / 2).astype(jnp.int32), 0, Wm - cw))

        # tile -> crop one-hot relocation; out-of-window tile rows/cols
        # get all-zero one-hot rows = the exact paste-then-crop clipping
        dy = y0s.astype(jnp.int32) - y0c  # tile row t -> crop row t+dy
        dx = x0s.astype(jnp.int32) - x0c
        oy = jnp.arange(ch, dtype=jnp.int32)
        ox = jnp.arange(cw, dtype=jnp.int32)
        R = (oy[None, :, None]
             == jnp.arange(th, dtype=jnp.int32)[None, None, :]
             + dy[:, None, None]).astype(dt)
        Cm = (ox[None, :, None]
              == jnp.arange(tw, dtype=jnp.int32)[None, None, :]
              + dx[:, None, None]).astype(dt)
        t2 = jnp.einsum("bot,bthc->bohc", R, tiles)
        t3 = jnp.einsum("bow,bhwc->bhoc", Cm, t2)
        m_c = t3[..., -1:]
        o_c = t3[..., :-1]

        def crop_scene(img, oy0, ox0):
            return jax.lax.dynamic_slice(
                img, (oy0, ox0, 0), (ch, cw, img.shape[-1]))

        sc = jax.vmap(crop_scene)(
            jax.lax.stop_gradient(scenes_model), y0c, x0c)
        adv = sc * (1.0 - m_c) + o_c * m_c
        return adv, m_c, (ch * cw) / (Hm * Wm)

    def _cost_tail(self, variables, adv_scenes, masks, scale,
                   fine: bool):
        """Shared objective tail: scale-s head selection + targeted
        zero-disparity masked MSE, rescaled to the full-frame mean."""
        s = 0 if fine else self.cfg.attack_scale
        if s:
            if self.predict_scale_fn is None:
                raise ValueError(
                    "attack_scale > 0 needs predict_scale_fn (the "
                    "trainer supplies the scale-s disparity head)")
            f = 2 ** s
            hh, ww = adv_scenes.shape[1] // f, adv_scenes.shape[2] // f
            # the scale-s head predicts the same disparity at 1/f res;
            # read the objective there and pool the mask to match —
            # the mean is resolution-invariant, so the crop rescale
            # carries over unchanged
            masks = bilinear_resize(masks, hh, ww)
            disp = self.predict_scale_fn(variables, adv_scenes)
        else:
            disp = self.predict_fn(variables, adv_scenes)
        # rescale the crop mean back to the full-frame mean so
        # magnitude-sensitive optimizers (Adam/APGD checkpoints)
        # see reference-scale costs. The product/reduction runs in f32
        # regardless of the view dtype (bf16 disp already promotes to
        # f32 against the f32 masks on the reference path; this keeps
        # the bf16-view path's cost reduction at the same precision).
        return jnp.mean((disp.astype(jnp.float32)
                         * masks.astype(jnp.float32)) ** 2) * scale

    def _targeted_cost(self, variables, adv_scenes, masks,
                       fine: bool = False):
        """Targeted zero-disparity MSE inside the object mask
        (phy_obj_atk.py:94): mean((disp * mask)^2) over full-frame
        composites, cropping them to the objective window first when
        the crop is configured (the reference path; _objective's fused
        route computes the same values without the full frame).
        `fine=True` forces the reference disp0 objective regardless of
        cfg.attack_scale (the tail of the coarse-to-fine schedule)."""
        B, H, W, _ = adv_scenes.shape
        cw = self.cfg.attack_crop_w
        ch = self.cfg.attack_crop_h
        cw = cw if cw is not None and cw < W else None
        ch = ch if ch is not None and ch < H else None
        scale = 1.0
        if cw is not None or ch is not None:
            adv_scenes, masks, scale = self._crop_to_object(
                adv_scenes, masks, cw or W, ch or H)
        return self._cost_tail(variables, adv_scenes, masks, scale,
                               fine)

    def _crop_to_object(self, adv_scenes, masks, cw: int, ch: int):
        """Crop each sample to (ch, cw) centered on the object mask's
        center of mass (integer offsets, stop-gradient)."""
        B, H, W, _ = adv_scenes.shape
        msum = jnp.maximum(jnp.sum(masks, axis=(1, 2, 3)), 1e-6)
        has = jnp.sum(masks, axis=(1, 2, 3)) > 0
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        cx = jnp.where(
            has,
            jnp.sum(masks[..., 0] * xs[None, None, :], axis=(1, 2))
            / msum, W / 2.0)
        cy = jnp.where(
            has,
            jnp.sum(masks[..., 0] * ys[None, :, None], axis=(1, 2))
            / msum, H / 2.0)
        x0 = jax.lax.stop_gradient(jnp.clip(
            jnp.round(cx - cw / 2).astype(jnp.int32), 0, W - cw))
        y0 = jax.lax.stop_gradient(jnp.clip(
            jnp.round(cy - ch / 2).astype(jnp.int32), 0, H - ch))

        def crop(img, offy, offx):
            return jax.lax.dynamic_slice(
                img, (offy, offx, 0), (ch, cw, img.shape[-1]))

        return (jax.vmap(crop)(adv_scenes, y0, x0),
                jax.vmap(crop)(masks, y0, x0), (ch * cw) / (H * W))

    def _band_sweep_extra(self):
        """(z0s, alphas) beyond cfg.dist_range/angle_range that this
        attack's FINAL sampling can produce. Subclasses that override
        `_final_za` with geometry outside the config ranges (e.g. the
        arbi attack's linspace(5, 30) distances) MUST override this so
        the static banded-warp proof in __init__ covers the finals
        path too (ADVICE r3 medium). Called before subclass __init__
        state exists — return constants only."""
        return (), ()

    def _final_za(self, rng, batch: int):
        """EoT sample for the final composites; subclasses with bespoke
        final sampling (e.g. the arbitrary-pattern attack's linspace
        distances, phy_obj_atk_arbi.py:91-92) override this (and
        `_band_sweep_extra` when the geometry leaves the cfg ranges)."""
        return self._sample_za(rng, batch)

    def _final_outputs(self, scenes_full, obj_adv, rng, eval_mode: bool):
        """Final projection with pinned eval sample; benign composite uses
        the adversarial masks (phy_obj_atk.py:114-121).

        Uses the exact warp-at-native-then-resize chain in eval mode or
        when cfg.exact_composite — reference-faithful composites for the
        metric pipeline; training-time finals (consumed as data by the
        distill/hardening losses) take the tiled fast path."""
        batch = scenes_full.shape[0]
        z0s, alphas = self._final_za(rng, batch)
        if eval_mode:
            z0s = z0s.at[0].set(self.cfg.eval_pin_z0)
            alphas = alphas.at[0].set(self.cfg.eval_pin_alpha)

        if eval_mode or self.cfg.exact_composite:
            obj_adv_s, mask_s = self.eot.warp_obj_mask(
                obj_adv, self.obj_mask, z0s, alphas)
            obj_ben_s, _ = self.eot.warp_obj_mask(
                self.obj_img, self.obj_mask, z0s, alphas)

            adv_full = self.eot.composite(scenes_full, obj_adv_s, mask_s)
            ben_full = self.eot.composite(scenes_full, obj_ben_s, mask_s)

            adv = bilinear_resize(adv_full, self.cfg.scene_h,
                                  self.cfg.scene_w)
            ben = bilinear_resize(ben_full, self.cfg.scene_h,
                                  self.cfg.scene_w)
            masks = bilinear_resize(mask_s, self.cfg.scene_h,
                                    self.cfg.scene_w)
            return adv, ben, masks

        scenes_model = bilinear_resize(scenes_full, self.cfg.scene_h,
                                       self.cfg.scene_w)
        kw = dict(model_h=self.cfg.scene_h, model_w=self.cfg.scene_w,
                  tile_h=min(self.cfg.tile_h, self.cfg.scene_h),
                  tile_w=min(self.cfg.tile_w, self.cfg.scene_w))
        if self.cfg.adjoint_mode == "separable":
            # adv + benign share the homographies: one stacked warp
            adv, ben, masks = self.eot.composite_tiled_pair(
                scenes_model, obj_adv, self.obj_img, self.obj_mask,
                z0s, alphas, bands_fit=self._bands_fit, **kw)
            return adv, ben, masks
        kw["adjoint_mode"] = self.cfg.adjoint_mode
        kw["bands_fit"] = self._bands_fit
        adv, masks = self.eot.composite_tiled_model(
            scenes_model, obj_adv, self.obj_mask, z0s, alphas, **kw)
        ben, _ = self.eot.composite_tiled_model(
            scenes_model, self.obj_img, self.obj_mask, z0s, alphas, **kw)
        return adv, ben, masks

    # -- subclass hook ---------------------------------------------------------
    def _optimize(self, variables, scenes_full, rng):
        """Returns the optimized adversarial object texture (1,h,w,3)."""
        raise NotImplementedError

    # -- entry -----------------------------------------------------------------
    def _run(self, variables, scenes, rng, batch_size: int,
             eval_mode: bool):
        scenes_full = self._replicate(scenes, batch_size)
        k_opt, k_final = jax.random.split(rng)
        obj_adv = self._optimize(variables, scenes_full, k_opt)
        adv, ben, masks = self._final_outputs(scenes_full, obj_adv,
                                              k_final, eval_mode)
        return adv, ben, masks, obj_adv

    def __call__(self, variables, scenes, batch_size: int, rng,
                 eval_mode: bool = False):
        key = (batch_size, eval_mode, scenes.shape)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(functools.partial(
                self._run, batch_size=batch_size, eval_mode=eval_mode))
        return self._jitted[key](variables, scenes, rng)
