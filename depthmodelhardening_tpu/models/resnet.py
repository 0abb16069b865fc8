"""ResNet feature encoders (flax.linen, NHWC) for depth and pose networks.

TPU-native re-design of the reference encoder
(DepthNetworks/monodepth2/networks/resnet_encoder.py:62-98): torchvision
ResNet-{18,34,50,101,152} trunk returning the 5 feature maps
[relu(bn(conv1)), layer1..layer4], with the (x - 0.45) / 0.225 input
normalization applied inside the module.

Conventions:
  * NHWC layout; convs map to the MXU via XLA (no kernel work needed).
  * Module names mirror the torch state-dict paths ("conv1", "bn1",
    "layer1_0", "downsample_0", ...) so models/torch_import.py can map
    pretrained .pth checkpoints mechanically.
  * BatchNorm: momentum 0.9 (== torch momentum 0.1), eps 1e-5; `train`
    toggles running-average use; batch_stats updates are global under
    pjit/GSPMD (a mean over a sharded batch axis is a global mean).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(name: str, dtype=jnp.float32):
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class _BNFold(nn.Module):
    """Declares nn.BatchNorm's exact variable tree (params scale/bias,
    batch_stats mean/var) but returns the eval-mode affine (mul, add)
    in f32 instead of applying it — so callers can FOLD the BatchNorm
    into the preceding conv's kernel/bias:

        bn_eval(conv(x, W)) == conv(x, W * mul) + add

    (output-channel scaling commutes with the conv sum and is
    unaffected by padding). Running stats are constants w.r.t. the
    attack inner loop, so the fold removes one full elementwise
    HBM pass per BN in both the forward and the input-gradient
    backward — the dominant non-conv cost of the PGD loop
    (scripts/profile_step.py, round 4)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        mul = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
        add = bias - ra_mean.value * mul
        return mul, add


def _folded_conv(x, kernel, mul, add, strides, padding, dtype):
    """conv(x, kernel*mul) + add — the BN-folded conv (NHWC/HWIO)."""
    k = (kernel * mul).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(strides, strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + add.astype(dtype)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 -> 3x3 with identity/projection skip."""

    features: int
    strides: int = 1
    project: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and not train:
            return self._call_folded(x)
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _bn("bn1", self.dtype)(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=1,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn("bn2", self.dtype)(y, use_running_average=not train)
        if self.project:
            identity = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_0")(x)
            identity = _bn("downsample_1", self.dtype)(
                identity, use_running_average=not train)
        return nn.relu(y + identity)

    def _call_folded(self, x):
        C = self.features
        k1 = _StemKernel((3, 3, x.shape[-1], C), name="conv1")()
        m1, a1 = _BNFold(name="bn1")(C)
        y = nn.relu(_folded_conv(x, k1, m1, a1, self.strides,
                                 ((1, 1), (1, 1)), self.dtype))
        k2 = _StemKernel((3, 3, C, C), name="conv2")()
        m2, a2 = _BNFold(name="bn2")(C)
        y = _folded_conv(y, k2, m2, a2, 1, ((1, 1), (1, 1)), self.dtype)
        identity = x
        if self.project:
            kd = _StemKernel((1, 1, x.shape[-1], C),
                             name="downsample_0")()
            md, ad = _BNFold(name="downsample_1")(C)
            identity = _folded_conv(x, kd, md, ad, self.strides,
                                    ((0, 0), (0, 0)), self.dtype)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1 (x4 expansion)."""

    features: int
    strides: int = 1
    project: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and not train:
            return self._call_folded(x)
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _bn("bn1", self.dtype)(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn("bn2", self.dtype)(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = _bn("bn3", self.dtype)(y, use_running_average=not train)
        if self.project:
            identity = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=self.strides, use_bias=False,
                               dtype=self.dtype, name="downsample_0")(x)
            identity = _bn("downsample_1", self.dtype)(
                identity, use_running_average=not train)
        return nn.relu(y + identity)

    def _call_folded(self, x):
        C, E = self.features, self.features * self.expansion
        k1 = _StemKernel((1, 1, x.shape[-1], C), name="conv1")()
        m1, a1 = _BNFold(name="bn1")(C)
        y = nn.relu(_folded_conv(x, k1, m1, a1, 1, ((0, 0), (0, 0)),
                                 self.dtype))
        k2 = _StemKernel((3, 3, C, C), name="conv2")()
        m2, a2 = _BNFold(name="bn2")(C)
        y = nn.relu(_folded_conv(y, k2, m2, a2, self.strides,
                                 ((1, 1), (1, 1)), self.dtype))
        k3 = _StemKernel((1, 1, C, E), name="conv3")()
        m3, a3 = _BNFold(name="bn3")(E)
        y = _folded_conv(y, k3, m3, a3, 1, ((0, 0), (0, 0)), self.dtype)
        identity = x
        if self.project:
            kd = _StemKernel((1, 1, x.shape[-1], E),
                             name="downsample_0")()
            md, ad = _BNFold(name="downsample_1")(E)
            identity = _folded_conv(x, kd, md, ad, self.strides,
                                    ((0, 0), (0, 0)), self.dtype)
        return nn.relu(y + identity)


_STAGES = {
    18: ([2, 2, 2, 2], BasicBlock),
    34: ([3, 4, 6, 3], BasicBlock),
    50: ([3, 4, 6, 3], Bottleneck),
    101: ([3, 4, 23, 3], Bottleneck),
    152: ([3, 8, 36, 3], Bottleneck),
}


def encoder_channels(num_layers: int) -> Sequence[int]:
    """Feature channel counts ([64, 64, 128, 256, 512] for <=34; x4 after
    stage 0 for bottleneck nets) — resnet_encoder.py:68, 84-85."""
    ch = [64, 64, 128, 256, 512]
    if num_layers > 34:
        ch = [ch[0]] + [c * 4 for c in ch[1:]]
    return tuple(ch)


def stage_in_features(num_layers: int, stage: int) -> int:
    """Input channel count of stage `stage` (0-indexed layer1..layer4)."""
    ch = encoder_channels(num_layers)
    return ch[stage]


def run_stage(x, stage: int, num_layers: int, dtype, train: bool,
              fold_bn: bool = False):
    """Apply ResNet stage `stage` (0 -> layer1, ..., 3 -> layer4) inside
    the caller's @nn.compact scope; block names follow the torch
    state-dict paths (layer{stage+1}_{b})."""
    blocks, block_cls = _STAGES[num_layers]
    width = (64, 128, 256, 512)[stage]
    stride = (1, 2, 2, 2)[stage]
    in_features = stage_in_features(num_layers, stage)
    for b in range(blocks[stage]):
        out_width = width * block_cls.expansion \
            if block_cls is Bottleneck else width
        project = (b == 0) and (stride != 1 or in_features != out_width)
        x = block_cls(width, strides=stride if b == 0 else 1,
                      project=project, dtype=dtype, fold_bn=fold_bn,
                      name=f"layer{stage + 1}_{b}")(x, train=train)
        in_features = out_width
    return x


class _StemKernel(nn.Module):
    """Bare stem kernel with nn.Conv's param name/init (checkpoint-
    compatible with the naive conv1)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class PackedBatchNorm(nn.Module):
    """BatchNorm over a width-packed (B,H,M,f*C) tensor, parameter- and
    numerics-compatible with nn.BatchNorm on the unpacked (B,H,W,C)
    tensor: per-lane batch moments are combined across the f phases
    (every phase sees the same element count, so the combined
    mean/E[x^2] are the exact unpacked batch statistics), running
    averages follow flax's momentum rule, and the affine params are
    the plain (C,) vectors tiled across phases."""

    channels: int
    f: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp, use_running_average: bool, xp2=None,
                 fold=False):
        """Normalize xp (and optionally a second equal-count phase
        tensor xp2, e.g. the stem's row phases — moments are then the
        average over both, matching the interleaved tensor's up to
        float reduction order). Returns the normalized tensor, or the
        (xp, xp2) pair when xp2 is given.

        fold=True (requires use_running_average): returns the UNTILED
        f32 (mul, add) instead so the caller can fold the affine into
        the preceding conv kernel (see _BNFold); xp/xp2 are ignored."""
        C, f = self.channels, self.f
        scale = self.param("scale", nn.initializers.ones, (C,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        parts = [xp] if xp2 is None else [xp, xp2]
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            lane_mean = sum(
                jnp.mean(p.astype(jnp.float32), axis=(0, 1, 2))
                for p in parts) / len(parts)                # (f*C,)
            lane_ex2 = sum(
                jnp.mean(jnp.square(p.astype(jnp.float32)),
                         axis=(0, 1, 2)) for p in parts) / len(parts)
            mean = jnp.mean(lane_mean.reshape(f, C), axis=0)
            ex2 = jnp.mean(lane_ex2.reshape(f, C), axis=0)
            var = ex2 - mean * mean
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        mul = (scale * jax.lax.rsqrt(var + self.epsilon))
        add = bias - mean * mul
        if fold:
            assert use_running_average, "fold needs running stats"
            return mul, add
        mul = jnp.tile(mul, f).astype(self.dtype)
        add = jnp.tile(add, f).astype(self.dtype)
        outs = [p.astype(self.dtype) * mul + add for p in parts]
        return outs[0] if xp2 is None else tuple(outs)


class PackedBasicBlock(nn.Module):
    """BasicBlock (stride 1, no projection — the layer1 shape) on
    width-packed activations; parameter tree identical to BasicBlock."""

    features: int
    f: int = 2
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, xp, train: bool = False):
        from ..ops.wpack_encoder import wpack_conv3x3_zero

        C, f = self.features, self.f
        k1 = _StemKernel((3, 3, C, C), name="conv1")()
        k2 = _StemKernel((3, 3, C, C), name="conv2")()
        if self.fold_bn and not train:
            # fold the eval-mode BN affines into the (unpacked) conv
            # kernels — packing is linear in the kernel and packed lane
            # i*C+c carries channel c, so scaling the unpacked output
            # axis == scaling every packed phase (see _BNFold)
            m1, a1 = PackedBatchNorm(C, f, name="bn1")(
                None, use_running_average=True, fold=True)
            m2, a2 = PackedBatchNorm(C, f, name="bn2")(
                None, use_running_average=True, fold=True)
            y = wpack_conv3x3_zero(xp, (k1 * m1).astype(self.dtype), f)
            y = nn.relu(y + jnp.tile(a1, f).astype(self.dtype))
            y = wpack_conv3x3_zero(y, (k2 * m2).astype(self.dtype), f)
            return nn.relu(y + jnp.tile(a2, f).astype(self.dtype) + xp)
        y = wpack_conv3x3_zero(xp, k1.astype(self.dtype), f)
        y = PackedBatchNorm(C, f, dtype=self.dtype, name="bn1")(
            y, use_running_average=not train)
        y = nn.relu(y)
        y = wpack_conv3x3_zero(y, k2.astype(self.dtype), f)
        y = PackedBatchNorm(C, f, dtype=self.dtype, name="bn2")(
            y, use_running_average=not train)
        return nn.relu(y + xp)


class ResnetEncoder(nn.Module):
    """ResNet trunk returning the 5 multi-scale feature maps.

    num_input_images > 1 stacks frames on channels (pose encoder); input is
    expected in [0, 1] and is normalized internally as (x - 0.45) / 0.225
    (resnet_encoder.py:89).
    """

    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32
    s2d_stem: bool = False
    wpack_stem: bool = False
    # 4x8-s2d stem (s2d8_stem_conv_dilated): 128 full input lanes
    # (vs the 4x4 blocking's 48/128), input normalization folded into
    # the kernel's ones channel, output natively f=4-width-packed.
    wpack_stem8: bool = False
    # with wpack_stem8: leave features[0] f=4-packed for a decoder
    # that consumes the packed skip directly (DepthDecoder
    # packed_skip0) — removes the two largest relayout passes.
    packed_f0: bool = False
    # Fold eval-mode BatchNorms into the conv kernels (exact algebra,
    # see _BNFold). Only active when train=False; train-mode passes
    # keep the reference batch-stat path. Same parameter tree.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.wpack_stem8:
            # raw [0,1] input: normalization is folded into the stem
            return self._call_wpacked8(x, train)
        x = ((x - 0.45) / 0.225).astype(self.dtype)
        fold = self.fold_bn and not train
        if self.wpack_stem:
            return self._call_wpacked(x, train)
        if fold:
            kernel = _StemKernel((7, 7, 3 * self.num_input_images, 64),
                                 name="conv1")()
            m, a = _BNFold(name="bn1")(64)
            if self.s2d_stem:
                from ..ops.fused_upconv import s2d_stem_conv

                x = s2d_stem_conv(x, (kernel * m).astype(self.dtype))
                x = x + a.astype(self.dtype)
            else:
                x = _folded_conv(x, kernel, m, a, 2, ((3, 3), (3, 3)),
                                 self.dtype)
        else:
            if self.s2d_stem:
                # exact space-to-depth rewrite of the 7x7/s2 stem:
                # Cin=3 occupies 3/128 MXU lanes; blocked Cin=12 at
                # quarter positions is ~4x denser. Same "conv1/kernel".
                from ..ops.fused_upconv import s2d_stem_conv

                kernel = _StemKernel(
                    (7, 7, 3 * self.num_input_images, 64),
                    name="conv1")()
                x = s2d_stem_conv(x, kernel.astype(self.dtype))
            else:
                x = nn.Conv(64, (7, 7), strides=2,
                            padding=((3, 3), (3, 3)), use_bias=False,
                            dtype=self.dtype, name="conv1")(x)
            x = _bn("bn1", self.dtype)(x, use_running_average=not train)
        f0 = nn.relu(x)

        x = nn.max_pool(f0, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        features = [f0]
        for stage in range(4):
            x = run_stage(x, stage, self.num_layers, self.dtype, train,
                          fold_bn=self.fold_bn)
            features.append(x)
        return features

    def _call_wpacked8(self, x, train: bool):
        """Stem + layer1 with the 4x8-s2d blocking: the stem conv
        runs 128 FULL input lanes (the 4x4 blocking left 48/128 — a
        measured 72 TF/s padded-lane wall), the (x-0.45)/0.225 input
        normalization is an extra ones-channel of the folded kernel
        (the full-frame normalize pass and its backward disappear),
        the stem emits f=4-width-packed, the 3x3/s2 pool consumes
        f=4 and emits f=2 AT THE SAME BLOCK COUNT (= layer1's packed
        input, zero relayouts stem->layer1), and with packed_f0 the
        f=4 stem feature feeds the decoder's packed skip directly.
        Exact to float associativity; identical parameter tree
        (tests/test_wpack_encoder.py)."""
        from ..ops.pallas_pool import maybe_pallas_pool4
        from ..ops.wpack_encoder import s2d8_stem_conv_dilated
        from ..ops.wpack_decoder import wunpack

        if self.num_layers > 34:
            raise ValueError("wpack_stem8 requires BasicBlock stages "
                             "(num_layers <= 34)")
        if self.num_input_images != 1:
            raise ValueError("wpack_stem8 folds the 3-channel input "
                             "normalization; use wpack_stem for "
                             "stacked-frame encoders")
        x = x.astype(self.dtype)
        kernel = _StemKernel((7, 7, 3, 64), name="conv1")()
        fold = self.fold_bn and not train
        if fold:
            m, a = PackedBatchNorm(64, 4, name="bn1")(
                None, use_running_average=True, fold=True)
            f0p = nn.relu(s2d8_stem_conv_dilated(
                x, (kernel * m).astype(self.dtype))
                + jnp.tile(a, 4).astype(self.dtype))
        else:
            f0p = s2d8_stem_conv_dilated(x, kernel.astype(self.dtype))
            f0p = PackedBatchNorm(64, 4, dtype=self.dtype,
                                  name="bn1")(
                f0p, use_running_average=not train)
            f0p = nn.relu(f0p)

        # f=2 packed, same block count; on TPU the pool's backward is
        # the VMEM-resident pallas kernel (ops/pallas_pool.py) — the
        # jnp chain's compare/select backward was the largest non-conv
        # bucket of the bench step (~35 ms, scripts/trace_summary.py)
        xp = maybe_pallas_pool4(f0p)
        blocks, _ = _STAGES[self.num_layers]
        for b in range(blocks[0]):
            xp = PackedBasicBlock(64, 2, dtype=self.dtype,
                                  fold_bn=self.fold_bn,
                                  name=f"layer1_{b}")(xp, train=train)

        f0 = f0p if self.packed_f0 else wunpack(f0p, 4)
        features = [f0, wunpack(xp, 2)]
        x = features[1]
        for stage in range(1, 4):
            x = run_stage(x, stage, self.num_layers, self.dtype, train,
                          fold_bn=self.fold_bn)
            features.append(x)
        return features

    def _call_wpacked(self, x, train: bool):
        """Stem + layer1 on width-packed activations (the encoder's
        two padded-lane FLOP sinks — ops/wpack_encoder.py): the 4x4-s2d
        stem emits wpack(f0, 2) natively, bn1/relu/maxpool and layer1's
        BasicBlocks stay packed (f=2: 64ch -> 128 lanes), and the
        layout is left only for the features list and layer2. Exact to
        float associativity; identical parameter tree
        (tests/test_wpack_encoder.py). Requires BasicBlock stages
        (num_layers <= 34). `x` arrives already normalized."""
        from ..ops.wpack_encoder import (
            s2d4_stem_conv_dilated, wpack_maxpool3x3s2_rowfirst,
        )
        from ..ops.wpack_decoder import wpack, wunpack

        if self.num_layers > 34:
            raise ValueError("wpack_stem requires BasicBlock stages "
                             "(num_layers <= 34)")
        kernel = _StemKernel((7, 7, 3 * self.num_input_images, 64),
                             name="conv1")()
        fold = self.fold_bn and not train
        # lhs-dilated stem: ONE conv emits the width-packed stem with
        # rows already interleaved (s2d4_stem_conv_dilated), so the
        # skip feature's row interleave — ~3 HBM relayout passes per
        # model pass in the step trace (scripts/trace_summary.py) —
        # disappears; bn/relu fuse into the conv output and the
        # 3x3/s2 pool is the rowfirst packed chain (lane-full
        # reduce_window + width max-chain). Values identical to the
        # phase-separated formulation (kept for parity testing:
        # s2d4_stem_conv_phases + phases_maxpool3x3s2); train-mode
        # moments equal up to float reduction order.
        if fold:
            m, a = PackedBatchNorm(64, 2, name="bn1")(
                None, use_running_average=True, fold=True)
            f0p = nn.relu(s2d4_stem_conv_dilated(
                x, (kernel * m).astype(self.dtype))
                + jnp.tile(a, 2).astype(self.dtype))
        else:
            f0p = s2d4_stem_conv_dilated(x, kernel.astype(self.dtype))
            f0p = PackedBatchNorm(64, 2, dtype=self.dtype,
                                  name="bn1")(
                f0p, use_running_average=not train)
            f0p = nn.relu(f0p)

        f0 = wunpack(f0p, 2)
        x = wpack_maxpool3x3s2_rowfirst(f0p)
        xp = wpack(x, 2)
        blocks, _ = _STAGES[self.num_layers]
        for b in range(blocks[0]):
            xp = PackedBasicBlock(64, 2, dtype=self.dtype,
                                  fold_bn=self.fold_bn,
                                  name=f"layer1_{b}")(xp, train=train)

        features = [f0, wunpack(xp, 2)]
        x = features[1]
        for stage in range(1, 4):
            x = run_stage(x, stage, self.num_layers, self.dtype, train,
                          fold_bn=self.fold_bn)
            features.append(x)
        return features
