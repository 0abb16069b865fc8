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
import jax.numpy as jnp


def _bn(name: str, dtype=jnp.float32):
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 -> 3x3 with identity/projection skip."""

    features: int
    strides: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
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


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1 (x4 expansion)."""

    features: int
    strides: int = 1
    project: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
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


class ResnetEncoder(nn.Module):
    """ResNet trunk returning the 5 multi-scale feature maps.

    num_input_images > 1 stacks frames on channels (pose encoder); input is
    expected in [0, 1] and is normalized internally as (x - 0.45) / 0.225
    (resnet_encoder.py:89).
    """

    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks, block_cls = _STAGES[self.num_layers]

        x = ((x - 0.45) / 0.225).astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn("bn1", self.dtype)(x, use_running_average=not train)
        f0 = nn.relu(x)

        x = nn.max_pool(f0, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        features = [f0]
        in_features = 64
        for stage, (n_blocks, width, stride) in enumerate(
                zip(blocks, (64, 128, 256, 512), (1, 2, 2, 2))):
            for b in range(n_blocks):
                out_width = width * getattr(block_cls, "expansion", 1) \
                    if block_cls is Bottleneck else width
                project = (b == 0) and (stride != 1 or in_features != out_width)
                x = block_cls(width, strides=stride if b == 0 else 1,
                              project=project, dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, train=train)
                in_features = out_width
            features.append(x)
        return features
