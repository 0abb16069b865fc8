"""UNet-style depth decoder (flax.linen, NHWC).

Reference: DepthNetworks/monodepth2/networks/depth_decoder.py:17-65 —
top-down ConvBlocks (reflection-pad 3x3 conv + ELU), nearest x2 upsample,
encoder skip connections, sigmoid disparity heads at 4 scales.

Module names mirror the torch decoder ModuleList ordering via explicit
("upconv", i, j)/("dispconv", s) names so torch_import can map
"decoder.<idx>..." keys mechanically.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import nearest_upsample2

NUM_CH_DEC = (16, 32, 64, 128, 256)


class Conv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 valid conv (layers.py:121-136)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (layers.py:106-118)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, dtype=self.dtype,
                              name="conv")(x))


class DepthDecoder(nn.Module):
    """Multi-scale disparity decoder.

    __call__(features) -> {("disp", s): (B, H/2^s, W/2^s, C_out)}.
    """

    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features) -> Dict[Tuple[str, int], jnp.ndarray]:
        outputs = {}
        x = input_features[-1].astype(self.dtype)
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = nearest_upsample2(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(self.dtype)], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(self.num_output_channels, dtype=self.dtype,
                               name=f"dispconv_{i}")(x)
                # disparities feed losses/geometry: keep them f32
                outputs[("disp", i)] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs


# torch ModuleList index -> our module name, following the construction
# order in depth_decoder.py:31-47 (upconv 4..0 x {0,1}, then dispconv 0..3).
def torch_decoder_index_name(idx: int, scales=(0, 1, 2, 3)) -> str:
    order = []
    for i in range(4, -1, -1):
        order.append(f"upconv_{i}_0")
        order.append(f"upconv_{i}_1")
    for s in scales:
        order.append(f"dispconv_{s}")
    return order[idx]
