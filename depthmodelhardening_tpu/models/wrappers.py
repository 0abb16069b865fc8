"""Model assembly: encoder + decoder wrappers and predictor bundles.

Reference: depth_model.py:10-58 (DepthModelWrapper returns ("disp", 0);
ManyDepthModelWrapper feeds zero lookup frames/poses into the cost-volume
encoder and rescales disparity by /8.6437).

`DepthPredictor` is the functional bundle attacks/eval consume: a static
apply_fn plus a variables pytree. Applying it always uses BatchNorm
running statistics (eval semantics), matching the reference's
Attack.__call__ which forces model.eval() during perturbation
(torchattacks/attack.py:296-320).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from .resnet import ResnetEncoder
from .depth_decoder import DepthDecoder


class MonodepthModel(nn.Module):
    """encoder + depth decoder; __call__ returns full-res disparity.

    dtype: compute dtype. bfloat16 is the TPU-native choice (params stay
    float32; disparity heads are cast back to float32 before sigmoid) —
    halves activation HBM and doubles MXU throughput.
    """

    num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32
    fuse_upconv: bool = False
    s2d_stem: bool = False
    wpack_stem: bool = False
    # 4x8-s2d stem: full input lanes, normalization folded into the
    # kernel, f=4-packed stem feature handed to the decoder skip
    # without relayout when wpack_decoder is also on
    wpack_stem8: bool = False
    packed_decoder: bool = False
    wpack_decoder: bool = False
    # fold eval-mode BatchNorm affines into the conv kernels (exact;
    # only active when train=False — resnet._BNFold)
    fold_bn: bool = False

    def setup(self):
        packed_f0 = self.wpack_stem8 and self.wpack_decoder
        self.encoder = ResnetEncoder(num_layers=self.num_layers,
                                     dtype=self.dtype,
                                     s2d_stem=self.s2d_stem,
                                     wpack_stem=self.wpack_stem,
                                     wpack_stem8=self.wpack_stem8,
                                     packed_f0=packed_f0,
                                     fold_bn=self.fold_bn,
                                     name="encoder")
        self.decoder = DepthDecoder(scales=tuple(self.scales),
                                    dtype=self.dtype,
                                    fuse_upconv=self.fuse_upconv,
                                    packed=self.packed_decoder,
                                    wpacked=self.wpack_decoder,
                                    packed_skip0=packed_f0,
                                    name="decoder")

    def __call__(self, x, train: bool = False):
        features = self.encoder(x, train=train)
        outputs = self.decoder(features)
        return outputs[("disp", 0)]

    def features_and_disps(self, x, train: bool = False):
        """Returns (features, {("disp", s): ...}) for the trainer."""
        features = self.encoder(x, train=train)
        return features, self.decoder(features)

    def encode(self, x, train: bool = False):
        """Encoder-only forward (trainer.py:360-361 contrastive branch)."""
        return self.encoder(x, train=train)


@flax.struct.dataclass
class DepthPredictor:
    """Frozen functional depth model: images (B,H,W,3) -> disp (B,H,W,1).

    A pytree (variables are leaves; apply_fn static), so it can be passed
    straight into jitted attack loops and donated/replicated under pjit.
    """

    apply_fn: Callable = flax.struct.field(pytree_node=False)
    variables: Any = flax.struct.field(pytree_node=True)

    def __call__(self, images):
        return self.apply_fn(self.variables, images)


def make_monodepth2(num_layers: int = 18,
                    scales: Sequence[int] = (0, 1, 2, 3),
                    dtype=jnp.float32, **perf_flags) -> MonodepthModel:
    """perf_flags: s2d_stem / wpack_stem / wpack_decoder /
    packed_decoder / fuse_upconv — exact flag-gated rewrites, same
    parameter tree."""
    return MonodepthModel(num_layers=num_layers, scales=scales,
                          dtype=dtype, **perf_flags)


def init_monodepth2(rng, height: int = 320, width: int = 1024,
                    num_layers: int = 18, dtype=jnp.float32,
                    **perf_flags):
    """Initialize a MonodepthModel; returns (module, variables)."""
    model = make_monodepth2(num_layers=num_layers, dtype=dtype,
                            **perf_flags)
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables


def predictor_from(model: MonodepthModel, variables) -> DepthPredictor:
    def apply_fn(v, images):
        return model.apply(v, images, train=False)

    return DepthPredictor(apply_fn=apply_fn, variables=variables)


def manydepth_rescale(disp):
    """ManyDepth wrapper output rescale (depth_model.py:58)."""
    return disp / 8.6437


class ManyDepthModel(nn.Module):
    """ManyDepth single-frame wrapper: cost-volume encoder fed with zero
    lookup frames/poses, decoder disp rescaled by /8.6437
    (depth_model.py:22-58 ManyDepthModelWrapper). K/invK must be the
    1/4-resolution unnormalized intrinsics (depth_model.py:60-75)."""

    num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    input_height: int = 192
    input_width: int = 640
    num_depth_bins: int = 96
    dtype: Any = jnp.float32
    fuse_upconv: bool = False
    packed_decoder: bool = False
    wpack_decoder: bool = False

    def setup(self):
        from .matching_encoder import ResnetEncoderMatching

        self.encoder = ResnetEncoderMatching(
            num_layers=self.num_layers, input_height=self.input_height,
            input_width=self.input_width,
            num_depth_bins=self.num_depth_bins, adaptive_bins=True,
            depth_binning="linear", dtype=self.dtype, name="encoder")
        self.decoder = DepthDecoder(scales=tuple(self.scales),
                                    dtype=self.dtype,
                                    fuse_upconv=self.fuse_upconv,
                                    packed=self.packed_decoder,
                                    wpacked=self.wpack_decoder,
                                    name="decoder")

    def __call__(self, x, K, invK, min_depth_bin=0.1,
                 max_depth_bin=20.0, train: bool = False):
        B = x.shape[0]
        lookup = jnp.zeros((B, 1) + x.shape[1:], x.dtype)
        poses = jnp.zeros((B, 1, 4, 4), jnp.float32)
        features, _, _ = self.encoder(
            x, lookup, poses, K, invK, min_depth_bin=min_depth_bin,
            max_depth_bin=max_depth_bin, train=train)
        outputs = self.decoder(features)
        return manydepth_rescale(outputs[("disp", 0)])

    def multi_frame(self, x, lookup_frames, rel_poses, K, invK,
                    min_depth_bin=0.1, max_depth_bin=20.0,
                    train: bool = False):
        """Real multi-frame ManyDepth inference: cost volume built from
        actual lookup frames + relative poses (the upstream ManyDepth
        test-time flow; the hardening reference zeroes lookups,
        manydepth2/trainer.py:360,376 — this is the beyond-reference
        path). Returns (disp, lowest_cost, confidence_mask).

        lookup_frames: (B, N, H, W, 3); rel_poses: (B, N, 4, 4)
        current->lookup camera transforms."""
        features, lowest_cost, confidence = self.encoder(
            x, lookup_frames, rel_poses, K, invK,
            min_depth_bin=min_depth_bin, max_depth_bin=max_depth_bin,
            train=train)
        outputs = self.decoder(features)
        return (manydepth_rescale(outputs[("disp", 0)]), lowest_cost,
                confidence)


class ManyDepthTrainModel(nn.Module):
    """ManyDepth model with the hardening trainer's interface
    (MonodepthModel-compatible: __call__/features_and_disps/encode).

    The reference's ManyDepth hardening trainer runs the cost-volume
    encoder in single-frame mode — zero lookup images, zero pose, fixed
    min/max depth bins from the pretrained checkpoint — and divides all
    disparities by 8.6437 (manydepth2/trainer.py:345-386).
    """

    num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    input_height: int = 320
    input_width: int = 1024
    num_depth_bins: int = 96
    min_depth_bin: float = 0.1
    max_depth_bin: float = 20.0
    dtype: Any = jnp.float32
    fuse_upconv: bool = False
    packed_decoder: bool = False
    wpack_decoder: bool = False

    def setup(self):
        from .matching_encoder import ResnetEncoderMatching

        self.encoder = ResnetEncoderMatching(
            num_layers=self.num_layers, input_height=self.input_height,
            input_width=self.input_width,
            num_depth_bins=self.num_depth_bins, adaptive_bins=False,
            min_depth_bin=self.min_depth_bin,
            max_depth_bin=self.max_depth_bin, dtype=self.dtype,
            name="encoder")
        self.decoder = DepthDecoder(scales=tuple(self.scales),
                                    dtype=self.dtype,
                                    fuse_upconv=self.fuse_upconv,
                                    packed=self.packed_decoder,
                                    wpacked=self.wpack_decoder,
                                    name="decoder")

    def _quarter_K(self, B):
        import numpy as np

        K = np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        K[0, :] *= self.input_width // 4
        K[1, :] *= self.input_height // 4
        invK = np.linalg.pinv(K)
        return (jnp.broadcast_to(jnp.asarray(K), (B, 4, 4)),
                jnp.broadcast_to(jnp.asarray(invK), (B, 4, 4)))

    def encode(self, x, train: bool = False):
        B = x.shape[0]
        K, invK = self._quarter_K(B)
        lookup = jnp.zeros((B, 1) + x.shape[1:], x.dtype)
        poses = jnp.zeros((B, 1, 4, 4), jnp.float32)
        # zero lookups + zero poses make the cost volume provably
        # all-missing; skip_cost_volume emits its constants directly
        # (exact; skips the 96-hypothesis sweep AND the lookup stem
        # pass — models/matching_encoder.py)
        features, _, _ = self.encoder(x, lookup, poses, K, invK,
                                      train=train,
                                      skip_cost_volume=True)
        return features

    def features_and_disps(self, x, train: bool = False):
        features = self.encode(x, train=train)
        outputs = self.decoder(features)
        return features, {k: manydepth_rescale(v)
                          for k, v in outputs.items()}

    def __call__(self, x, train: bool = False):
        _, outputs = self.features_and_disps(x, train=train)
        return outputs[("disp", 0)]

    # -- real-lookup training (beyond the reference) ----------------------
    def encode_multi(self, x, lookup_frames, rel_poses,
                     train: bool = False):
        """Cost volume from REAL lookup frames + relative poses. The
        reference hardening trainer always zeroes lookups
        (manydepth2/trainer.py:345-386); this is the upstream-ManyDepth-
        style training path (cfg.manydepth_real_lookup).
        lookup_frames: (B, F, H, W, 3); rel_poses: (B, F, 4, 4)
        current->lookup camera transforms (the selfsup warp convention,
        training/selfsup.py)."""
        B = x.shape[0]
        K, invK = self._quarter_K(B)
        features, _, _ = self.encoder(x, lookup_frames, rel_poses,
                                      K, invK, train=train)
        return features

    def features_and_disps_multi(self, x, lookup_frames, rel_poses,
                                 train: bool = False):
        features = self.encode_multi(x, lookup_frames, rel_poses,
                                     train=train)
        outputs = self.decoder(features)
        return features, {k: manydepth_rescale(v)
                          for k, v in outputs.items()}


def quarter_intrinsics(K_norm: jnp.ndarray, width: int, height: int):
    """Normalized 4x4 intrinsics -> 1/4-size unnormalized (K, invK),
    (depth_model.py:60-75 load_and_preprocess_intrinsics)."""
    import numpy as np

    K = np.asarray(K_norm, np.float64).copy()
    K[0, :] *= width // 4
    K[1, :] *= height // 4
    return (jnp.asarray(K, jnp.float32),
            jnp.asarray(np.linalg.pinv(K), jnp.float32))
