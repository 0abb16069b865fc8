"""On-device stereo-consistent adversarial batch synthesis.

Re-design of MonoDataset.prep_adv_data (mono_dataset.py:186-265), which
the reference runs on CPU inside DataLoader workers after copying the
GPU-optimized texture to host (mono_dataset.py:178-184). Here the whole
synthesis is a jit-able function of (raw stereo frames, textures, rng)
that runs in the same XLA computation as the training step — no
device<->host round trip.

Semantics preserved (per batch item):
  * one (z0, alpha) EoT sample;
  * the *current* side's frame gets the adversarial texture, the other
    stereo eye gets the benign texture placed through the 0.54 m-baseline
    extrinsic (mono_dataset.py:112-117, 205-220): current side "l" uses
    the identity extrinsic for frame "0" and stereo_T for "s";
    side "r" swaps them;
  * "color_ben" is the benign composite of the current frame at the same
    (z0, alpha) (mono_dataset.py:239-251);
  * the photometric target ("color","0") *is* the benign composite and
    ("color","s") is the synthesized stereo frame (mono_dataset.py:257-258),
    so the reprojection loss sees geometrically consistent benign
    textures while the model input ("color_aug","0") is adversarial;
  * horizontal flip commutes with alpha compositing, so instead of
    flipping warped textures before compositing (mono_dataset.py:222-225)
    we composite first and flip the composite; raw mono frames are
    flipped directly (get_color semantics);
  * half_no_synthesis keeps a random half of the batch raw
    (mono_dataset.py:321-329);
  * objmask/objdepth channels for the --gt_depth supervised variant
    (mono_dataset.py:253-255).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import bilinear_resize
from ..physics.eot import (
    EoTCompositor, EoTConfig, ORI_H, ORI_W, TRAIN_DIST_RANGE, ANGLE_RANGE,
    monodepth2_K, stereo_T,
)
from .config import AdvSynthConfig, SelfSupConfig


def make_synth_compositor(obj_h: int, obj_w: int,
                          ori_h: int = ORI_H,
                          ori_w: int = ORI_W) -> EoTCompositor:
    """Dataset-side compositor: projects through Monodepth2 normalized
    intrinsics (mono_dataset.py:169-175), not the KITTI calib the attack
    uses."""
    return EoTCompositor(EoTConfig(
        obj_h=obj_h, obj_w=obj_w, scene_h=ori_h, scene_w=ori_w,
        projection=monodepth2_K(ori_w, ori_h)[:3, :], proj_eps=1e-7))


def _flip_where(img, do_flip):
    """Flip W axis per-sample. img (B,H,W,C), do_flip (B,) bool."""
    return jnp.where(do_flip[:, None, None, None], img[:, :, ::-1, :], img)


def synthesize_adv_batch(
        eot: EoTCompositor,
        frames: Dict[str, jnp.ndarray],
        obj_adv: jnp.ndarray,
        obj_ben: jnp.ndarray,
        obj_mask: jnp.ndarray,
        side_is_l: jnp.ndarray,
        do_flip: jnp.ndarray,
        rng: jax.Array,
        selfsup_cfg: SelfSupConfig,
        adv_cfg: AdvSynthConfig,
        dist_range: Optional[np.ndarray] = None,
        angle_range: Optional[np.ndarray] = None,
):
    """Build the hardening batch's color planes on device.

    Args:
      frames: {fid: (B, ori_h, ori_w, 3)} raw *unflipped* side-resolved
        frames ("0" = current side, "s" = other eye, mono ids as-is).
      obj_adv/obj_ben: (1, oh, ow, 3); obj_mask: (1, oh, ow, 1).
      side_is_l / do_flip: (B,) bool.
    Returns a dict with "color", "color_aug" (per fid, model resolution),
    "color_ben", "objmask", "objdepth".
    """
    H, W = selfsup_cfg.height, selfsup_cfg.width
    B = frames["0"].shape[0]
    dist = jnp.asarray(TRAIN_DIST_RANGE if dist_range is None else
                       dist_range, jnp.float32)
    angles = jnp.asarray(ANGLE_RANGE if angle_range is None else
                         angle_range, jnp.float32)

    k_z, k_a, k_half = jax.random.split(rng, 3)
    z0s = jax.random.choice(k_z, dist, shape=(B,))
    alphas = jax.random.choice(k_a, angles, shape=(B,))

    T_id = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    T_st = jnp.broadcast_to(
        jnp.asarray(stereo_T(adv_cfg.baseline, side="l")), (B, 4, 4))
    sel = side_is_l[:, None, None]
    T_cur = jnp.where(sel, T_id, T_st)
    T_oth = jnp.where(sel, T_st, T_id)

    oh_, ow_ = eot.cfg.scene_h, eot.cfg.scene_w
    # tile sized for the closest training distance (z0 >= 5 m the quad
    # spans <= ~230x270 px at native res) and clamped to the scene
    th = min(248, oh_ - oh_ % 8 if oh_ % 8 else oh_)
    tw = min(296, ow_ - ow_ % 8 if ow_ % 8 else ow_)

    def tiled(scene, tex, T):
        # same composite as warp->alpha blend at native res, evaluated
        # only on a tile around the quad (physics/eot.py fast path)
        return eot.composite_tiled_model(
            scene, tex, obj_mask, z0s, alphas, model_h=oh_, model_w=ow_,
            tile_h=th, tile_w=tw, T=T)

    # the current frame's adversarial + benign composites share the
    # scene and extrinsic — one stacked separable warp does both
    cur_adv, cur_ben, mask_ben_cur = eot.composite_tiled_pair(
        frames["0"], obj_adv, obj_ben, obj_mask, z0s, alphas,
        model_h=oh_, model_w=ow_, tile_h=th, tile_w=tw, T=T_cur)
    oth_ben, mask_oth = tiled(frames["s"], obj_ben, T_oth)

    if adv_cfg.half_no_synthesis:
        synth = jax.random.bernoulli(k_half, 0.5, (B,))
        keep = lambda s, r: jnp.where(synth[:, None, None, None], s, r)
        cur_adv = keep(cur_adv, frames["0"])
        cur_ben = keep(cur_ben, frames["0"])
        oth_ben = keep(oth_ben, frames["s"])
        mask_ben_cur = keep(mask_ben_cur, jnp.zeros_like(mask_ben_cur))

    cur_adv = _flip_where(cur_adv, do_flip)
    cur_ben = _flip_where(cur_ben, do_flip)
    oth_ben = _flip_where(oth_ben, do_flip)
    mask_full = _flip_where(mask_ben_cur, do_flip)

    out = {
        "color": {"0": bilinear_resize(cur_ben, H, W),
                  "s": bilinear_resize(oth_ben, H, W)},
        "color_aug": {"0": bilinear_resize(cur_adv, H, W)},
        "color_ben": bilinear_resize(cur_ben, H, W),
        "objmask": bilinear_resize(mask_full, H, W),
        "objdepth": z0s,
    }
    out["color_aug"]["s"] = out["color"]["s"]

    for fid in selfsup_cfg.temporal_source_ids:
        col = bilinear_resize(_flip_where(frames[fid], do_flip), H, W)
        out["color"][fid] = col
        out["color_aug"][fid] = col

    if adv_cfg.color_aug:
        out = _jitter_aug_planes(out, rng, selfsup_cfg)
    return out


def _jitter_aug_planes(out, rng, selfsup_cfg):
    """Per-item color jitter on the augmented planes + color_ben
    (mono_dataset.py:296-297, 344-350: jitter applies with prob 0.5 per
    item, same parameters for every frame of the item, to "color_aug"
    keys and "color_ben" — never to "color").

    On-device variant: per-item factors traced; the op order is the
    canonical brightness/contrast/saturation/hue (the reference permutes
    order per item — a per-batch-element permutation would force 24-way
    branching under jit for a visually negligible difference).
    """
    from ..ops.color import (
        adjust_brightness, adjust_contrast, adjust_hue, adjust_saturation,
    )

    B = out["color_ben"].shape[0]
    k_en, kb, kc, ks, kh = jax.random.split(jax.random.fold_in(rng, 7), 5)
    enabled = jax.random.bernoulli(k_en, 0.5, (B,))
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=0.8, maxval=1.2)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=0.8, maxval=1.2)
    fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=0.8, maxval=1.2)
    fh = jax.random.uniform(kh, (B, 1, 1), minval=-0.1, maxval=0.1)

    def jit_img(img):
        j = adjust_brightness(img, fb)
        j = adjust_contrast(j, fc)
        j = adjust_saturation(j, fs)
        j = adjust_hue(j, fh)
        return jnp.where(enabled[:, None, None, None], j, img)

    out["color_ben"] = jit_img(out["color_ben"])
    out["color_aug"] = {fid: jit_img(img)
                        for fid, img in out["color_aug"].items()}
    return out


def build_plain_batch(frames: Dict[str, jnp.ndarray],
                      side_is_l, do_flip, rng,
                      selfsup_cfg: SelfSupConfig,
                      color_aug: bool = True):
    """Non-adversarial batch: the reference's vanilla Monodepth2 item
    pipeline (mono_dataset.py:294-350 without the adv hooks) — resized
    frames as both color and color_aug (with optional per-item jitter on
    the aug planes), per-item flips applied on device.
    """
    H, W = selfsup_cfg.height, selfsup_cfg.width
    out = {"color": {}, "color_aug": {}}
    for fid in selfsup_cfg.frame_ids:
        col = bilinear_resize(_flip_where(frames[fid], do_flip), H, W)
        out["color"][fid] = col
        out["color_aug"][fid] = col
    out["color_ben"] = out["color"]["0"]
    if color_aug:
        out = _jitter_aug_planes(out, rng, selfsup_cfg)
    out.pop("color_ben")
    out["stereo_T"] = stereo_T_batch(side_is_l, do_flip)
    return out


def stereo_T_batch(side_is_l, do_flip) -> jnp.ndarray:
    """Per-sample normalized stereo extrinsic for the photometric warp
    (mono_dataset.py:367-373): translation 0.1, sign flipped by side and
    by horizontal flip."""
    side_sign = jnp.where(side_is_l, -1.0, 1.0)
    baseline_sign = jnp.where(do_flip, -1.0, 1.0)
    B = side_is_l.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    return T.at[:, 0, 3].set(side_sign * baseline_sign * 0.1)
