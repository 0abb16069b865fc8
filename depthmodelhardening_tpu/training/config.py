"""Typed training configuration.

Replaces the reference's two generations of argparse options
(options.py:3-18 root dict; DepthNetworks/monodepth2/options.py:15-233
MonodepthOptions) and the hard-coded adv-train hyperparameter dicts
(trainer.py:199-223) with frozen dataclasses usable as static jit args.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SelfSupConfig:
    """Self-supervised monodepth training options (monodepth2/options.py).

    frame_ids uses strings so "s" (stereo) can join temporal offsets,
    e.g. ("0", "s") for stereo training or ("0", "-1", "1") for mono.
    """

    height: int = 320
    width: int = 1024
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    frame_ids: Tuple[str, ...] = ("0", "s")
    min_depth: float = 0.1
    max_depth: float = 100.0
    disparity_smoothness: float = 1e-3
    no_ssim: bool = False
    avg_reprojection: bool = False
    disable_automasking: bool = False
    v1_multiscale: bool = False
    # The stereo photometric warp uses the MXU row-resample fast path
    # (ops/sampling.py:bilinear_sample_rows), which is exact ONLY when
    # batch["stereo_T"] is a rectified pure x-translation (identity
    # rotation, zero y/z translation) — true for the built-in
    # stereo_T/stereo_T_batch. Set False for custom extrinsics with
    # rotation or y/z components to take the generic 2-D sampler;
    # concrete (untraced) stereo_T values are additionally verified at
    # trace time (selfsup.py:_stereo_is_pure_x, ADVICE r3).
    rectified_stereo: bool = True

    @property
    def use_stereo(self) -> bool:
        return "s" in self.frame_ids

    @property
    def source_frame_ids(self) -> Tuple[str, ...]:
        return tuple(f for f in self.frame_ids if f != "0")

    @property
    def temporal_source_ids(self) -> Tuple[str, ...]:
        return tuple(f for f in self.frame_ids if f not in ("0", "s"))

    @property
    def use_pose_net(self) -> bool:
        # monodepth2/trainer.py:64: pose net iff mono frames present.
        return len(self.temporal_source_ids) > 0


@dataclasses.dataclass(frozen=True)
class AdvSynthConfig:
    """Adversarial batch-synthesis options (trainer.py:199-223 args dict +
    mono_dataset.py:147-175 set_adv_train)."""

    norm_type: str = "l_0"  # {"l_inf", "l_0"}
    epsilon: float = 0.1  # l_inf budget (trainer.py:205)
    alpha: float = 0.005  # l_inf step (trainer.py:206)
    steps: int = 10  # attack steps (trainer.py:207)
    adam_lr: float = 0.5
    mask_wt: float = 0.05
    l0_thresh: float = 0.1
    attack_batch_size: int = 16  # args['batch_size'] used by the attack
    color_aug: bool = False  # adv_args['color_aug'] (mono_dataset.py:297)
    # width-cropped attack objective (attacks/base.py attack_crop_w):
    # None = reference full-frame model pass in the PGD loop
    attack_crop_w: Optional[int] = None
    attack_crop_h: Optional[int] = None
    # inner-loop objective from the scale-s disparity head (0 =
    # reference disp0 objective; attacks/base.py attack_scale), with
    # the last attack_scale_fine_steps inner steps back at disp0
    attack_scale: int = 0
    attack_scale_fine_steps: int = 1
    # PGD-loop model-view compute dtype on the fused cropped path
    # (attacks/base.py attack_view_dtype); "float32" = reference
    attack_view_dtype: str = "float32"
    # EoT warp tile size (attacks/base.py tile_h/tile_w)
    tile_h: int = 256
    tile_w: int = 256
    half_no_synthesis: bool = False
    obj_name: str = "BMW"
    baseline: float = 0.54  # stereo extrinsic (mono_dataset.py:116)
    ori_h: int = 375  # native KITTI scene size (my_utils.py:12-13)
    ori_w: int = 1242


@dataclasses.dataclass(frozen=True)
class HardeningConfig:
    """Full ICLR'23 hardening recipe (monodepth2/trainer.py)."""

    selfsup: SelfSupConfig = SelfSupConfig()
    adv: AdvSynthConfig = AdvSynthConfig()
    supervised_adv: bool = True
    contrastive_learning: bool = True
    contras_loss_wt: float = 1.0  # 0.1 for depth-hints (trainer.py:617)
    sup_loss_wt: float = 1.0
    no_original_train: bool = False
    gt_depth: bool = False
    learning_rate: float = 1e-5  # hardening recipe (README.md:87-103)
    scheduler_step_size: int = 15  # epochs (options.py:142-145)
    scheduler_gamma: float = 0.1
    num_layers: int = 18
    batch_size: int = 32
    # "bfloat16" = TPU-native compute dtype (params stay f32)
    compute_dtype: str = "float32"
    # DepthHints family: proxy-supervised hint loss + 3-way loss masks
    # (depth-hints/trainer.py:541-591); batches must carry
    # depth_hint/depth_hint_mask planes. contras_loss_wt should be 0.1
    # for this family (trainer.py:617).
    use_depth_hints: bool = False
    # "monodepth2" | "manydepth": manydepth runs the cost-volume encoder
    # in single-frame mode with /8.6437 disparity rescale
    # (manydepth2/trainer.py:345-386)
    model_family: str = "monodepth2"
    manydepth_num_depth_bins: int = 96
    # build the cost volume from the real previous frame + pose-net
    # pose instead of the reference's zero lookups (beyond-reference;
    # requires model_family="manydepth" and monocular frame_ids)
    manydepth_real_lookup: bool = False
    # exact TPU conv rewrites (models/resnet.py s2d_stem / wpack_stem,
    # models/depth_decoder.py fuse_upconv / packed channel-major
    # decoder stages, ops/packed_decoder.py) — numerics identical.
    # wpack_stem supersedes s2d_stem (it covers the stem AND layer1).
    s2d_stem: bool = False
    wpack_stem: bool = False
    # 4x8-s2d stem: full input lanes + normalization fold +
    # f=4-packed skip handoff to the wpack decoder (exact;
    # models/resnet.py _call_wpacked8). Supersedes wpack_stem.
    wpack_stem8: bool = False
    fuse_upconv: bool = False
    packed_decoder: bool = False
    wpack_decoder: bool = False
    # fold eval-mode BatchNorms into conv kernels on the eval-only
    # model clones (attack predictor / teacher) — exact algebra,
    # models/resnet.py:_BNFold; train-mode passes are unaffected
    fold_bn: bool = True


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """simple_adv_training.py distillation-only hardening."""

    adv_type: str = "object"  # {"object", "image", "object_l0"}
    epsilon: float = 0.1
    alpha: float = 0.005
    steps: int = 10
    adam_lr: float = 0.5
    mask_wt: float = 0.05
    l0_thresh: float = 0.1
    batch_size: int = 16
    learning_rate: float = 1e-4  # simple_adv_training.py:115
    epochs: int = 20
    compute_dtype: str = "float32"
    obj_name: str = "BMW"
    attack_crop_w: Optional[int] = None
    attack_crop_h: Optional[int] = None
    attack_scale: int = 0
    attack_scale_fine_steps: int = 1
    attack_view_dtype: str = "float32"
    tile_h: int = 256
    tile_w: int = 256
    s2d_stem: bool = False
    wpack_stem: bool = False
    # 4x8-s2d stem: full input lanes + normalization fold +
    # f=4-packed skip handoff to the wpack decoder (exact;
    # models/resnet.py _call_wpacked8). Supersedes wpack_stem.
    wpack_stem8: bool = False
    fuse_upconv: bool = False
    packed_decoder: bool = False
    wpack_decoder: bool = False
    # fold eval-mode BatchNorms into conv kernels on the eval-only
    # model clones (attack predictor / teacher) — exact algebra,
    # models/resnet.py:_BNFold; train-mode passes are unaffected
    fold_bn: bool = True
    scene_h: int = 320
    scene_w: int = 1024
    ori_h: int = 375
    ori_w: int = 1242
