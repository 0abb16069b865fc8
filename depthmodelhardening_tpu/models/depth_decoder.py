"""UNet-style depth decoder (flax.linen, NHWC).

Reference: DepthNetworks/monodepth2/networks/depth_decoder.py:17-65 —
top-down ConvBlocks (reflection-pad 3x3 conv + ELU), nearest x2 upsample,
encoder skip connections, sigmoid disparity heads at 4 scales.

Module names mirror the torch decoder ModuleList ordering via explicit
("upconv", i, j)/("dispconv", s) names so torch_import can map
"decoder.<idx>..." keys mechanically.

`fuse_upconv=True` computes each upsample->upconv_i_1 pair with the
exact phase-packed 2x2 conv rewrite (ops/fused_upconv.py): the
upsampled branch of the conv runs at pre-upsample resolution with 4x
the output lanes and no materialized upsampled tensor, the skip branch
stays a plain reflect-pad conv, and the two are summed — numerically
identical to the naive path (same parameter tree, same values up to
float associativity), just a faster XLA program on TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import nearest_upsample2
from ..ops.fused_upconv import fused_upsample_conv3x3

NUM_CH_DEC = (16, 32, 64, 128, 256)


class Conv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 valid conv (layers.py:121-136)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.padding import conv3x3_reflect_same

        # exact SAME-conv + border-correction decomposition: keeps the
        # conv on XLA's fused path instead of materializing a reflect-
        # padded tensor whose autodiff is scatter-grade (ops/padding.py)
        kernel, bias = _ConvParams(self.features, x.shape[-1],
                                   name="conv")()
        return conv3x3_reflect_same(x, kernel, bias, dtype=self.dtype)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (layers.py:106-118)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, dtype=self.dtype,
                              name="conv")(x))


class _ConvParams(nn.Module):
    """Bare kernel/bias with nn.Conv's param names and inits, for code
    paths that consume the kernel directly (the fused upconv)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        return kernel, bias


class _Conv3x3Params(nn.Module):
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _ConvParams(self.features, self.in_features,
                           name="conv")()


class _ConvBlockParams(nn.Module):
    """Parameter tree identical to ConvBlock(name=...)(Conv3x3(name=
    "conv")(nn.Conv(name="conv"))), values consumed by the caller."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _Conv3x3Params(self.features, self.in_features,
                              name="conv")()


def _reflect_conv3x3(x, kernel, dtype):
    from ..ops.padding import conv3x3_reflect_same

    return conv3x3_reflect_same(x, kernel, dtype=dtype)


class DepthDecoder(nn.Module):
    """Multi-scale disparity decoder.

    __call__(features) -> {("disp", s): (B, H/2^s, W/2^s, C_out)}.

    `packed=True` runs the two largest stages (i=1, i=0: the 96->32,
    32->16, 16->16 convs and the scale-0/1 disparity heads) on
    channel-major space-to-depth activations (ops/packed_decoder.py):
    4x the MXU lanes at 1/4 the positions, exact to float
    associativity, same parameter tree. Measured the decoder's floor on
    v5e (docs/PERFORMANCE.md "Known remaining headroom").
    """

    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32
    fuse_upconv: bool = False
    packed: bool = False
    wpacked: bool = False
    # input_features[0] arrives f=4-width-packed (the wpack_stem8
    # encoder's native stem layout) — consume it directly instead of
    # wpack()ing the unpacked skip (saves the two largest relayout
    # passes of the model: the encoder-side wunpack and the
    # decoder-side repack of the full-res stem feature).
    packed_skip0: bool = False

    @nn.compact
    def __call__(self, input_features) -> Dict[Tuple[str, int], jnp.ndarray]:
        if self.wpacked:
            return self._call_wpacked(input_features)
        if self.packed:
            return self._call_packed(input_features)
        outputs = {}
        x = input_features[-1].astype(self.dtype)
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            skip = (input_features[i - 1].astype(self.dtype)
                    if self.use_skips and i > 0 else None)
            if self.fuse_upconv:
                ch_up = x.shape[-1]
                cin = ch_up + (skip.shape[-1] if skip is not None
                               else 0)
                kernel, bias = _ConvBlockParams(
                    NUM_CH_DEC[i], cin, name=f"upconv_{i}_1")()
                y = fused_upsample_conv3x3(
                    x, kernel[:, :, :ch_up].astype(self.dtype))
                if skip is not None:
                    y = y + _reflect_conv3x3(
                        skip, kernel[:, :, ch_up:], self.dtype)
                x = nn.elu(y + bias.astype(self.dtype))
            else:
                x = nearest_upsample2(x)
                if skip is not None:
                    x = jnp.concatenate([x, skip], axis=-1)
                x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                              name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(self.num_output_channels, dtype=self.dtype,
                               name=f"dispconv_{i}")(x)
                # disparities feed losses/geometry: keep them f32
                outputs[("disp", i)] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs

    def _call_packed(self, input_features) -> Dict[Tuple[str, int],
                                                   jnp.ndarray]:
        """Stages 4..2 as in the naive path; stages 1 and 0 (and their
        disparity heads) on packed activations. Numerically identical
        to the naive path up to float associativity
        (tests/test_packed_decoder.py)."""
        from ..ops.packed_decoder import (
            pack2, packed_conv3x3_reflect, tile4, unpack2,
        )

        def packed_disp(xhat, ch, i):
            kernel, bias = _Conv3x3Params(
                self.num_output_channels, ch, name=f"dispconv_{i}")()
            d = packed_conv3x3_reflect(xhat, kernel.astype(self.dtype),
                                       bias.astype(self.dtype))
            return nn.sigmoid(unpack2(d).astype(jnp.float32))

        outputs = {}
        x = input_features[-1].astype(self.dtype)
        for i in range(4, 1, -1):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = nearest_upsample2(x)
            if self.use_skips:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(self.dtype)], -1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(self.num_output_channels,
                               dtype=self.dtype,
                               name=f"dispconv_{i}")(x)
                outputs[("disp", i)] = nn.sigmoid(
                    disp.astype(jnp.float32))

        # i=1: unpacked conv at /4, then enter packed layout through the
        # upsample (tile4) + packed skip
        x = ConvBlock(NUM_CH_DEC[1], dtype=self.dtype,
                      name="upconv_1_0")(x)
        segs = [tile4(x)]
        seg_ch = [x.shape[-1]]
        if self.use_skips:
            skip = input_features[0].astype(self.dtype)
            segs.append(pack2(skip))
            seg_ch.append(skip.shape[-1])
        k1, b1 = _ConvBlockParams(NUM_CH_DEC[1], sum(seg_ch),
                                  name="upconv_1_1")()
        xhat = nn.elu(packed_conv3x3_reflect(
            segs, k1.astype(self.dtype), b1.astype(self.dtype),
            segment_channels=tuple(seg_ch)))
        if 1 in self.scales:
            outputs[("disp", 1)] = packed_disp(xhat, NUM_CH_DEC[1], 1)

        # i=0: stays packed end-to-end; the /2 -> /1 upsample is the one
        # genuine relayout (a cheap 16-channel unpack)
        k0a, b0a = _ConvBlockParams(NUM_CH_DEC[0], NUM_CH_DEC[1],
                                    name="upconv_0_0")()
        xhat = nn.elu(packed_conv3x3_reflect(
            xhat, k0a.astype(self.dtype), b0a.astype(self.dtype)))
        xhat = tile4(unpack2(xhat))
        k0b, b0b = _ConvBlockParams(NUM_CH_DEC[0], NUM_CH_DEC[0],
                                    name="upconv_0_1")()
        xhat = nn.elu(packed_conv3x3_reflect(
            xhat, k0b.astype(self.dtype), b0b.astype(self.dtype)))
        if 0 in self.scales:
            outputs[("disp", 0)] = packed_disp(xhat, NUM_CH_DEC[0], 0)
        return outputs

    def _call_wpacked(self, input_features) -> Dict[Tuple[str, int],
                                                    jnp.ndarray]:
        """Stages 4..2 naive (channels >= 64); stages 1 and 0 on
        WIDTH-packed activations (ops/wpack_decoder.py) held END TO END:
        enter the packed layout once at upconv_1_0 (f=2), FUSE each
        nearest-up2 into the following conv (wpack_up2conv3x3_reflect:
        f 2->4 and 4->8 without ever materializing the upsampled
        tensor), pack the skip once (f=4), and leave the layout only
        for the final 1-channel disparities. The earlier
        unpack -> jnp.repeat -> repack chain looked free ("contiguous
        reshapes") but each (W,C)<->(M,fC) reshape is a full HBM
        lane/sublane relayout on TPU — ~16 ms/pass at 320x1024 in
        hlo_stats traces. Exact to float associativity; same parameter
        tree (tests/test_packed_decoder.py)."""
        from ..ops.wpack_decoder import (
            wpack, wpack_conv3x3_reflect, wpack_dispconv,
            wpack_up2conv3x3_reflect, wunpack,
        )

        outputs = {}
        x = input_features[-1].astype(self.dtype)
        for i in (4, 3, 2):
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_0")(x)
            x = nearest_upsample2(x)
            if self.use_skips:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(self.dtype)], -1)
            x = ConvBlock(NUM_CH_DEC[i], dtype=self.dtype,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                if self.num_output_channels == 1 and x.shape[2] >= 4:
                    # tap-split head on the transiently f=2-packed
                    # tensor (wpack is a reshape): a 1-channel 3x3
                    # head pads Cout 1 -> 128 on the MXU (64x executed
                    # waste at 16ch); the tap-split matmul contracts
                    # all 9 taps at once (ops/wpack_decoder.py)
                    k, b = _Conv3x3Params(1, x.shape[-1],
                                          name=f"dispconv_{i}")()
                    d = wpack_dispconv(wpack(x, 2), k.astype(self.dtype),
                                       b.astype(self.dtype), f=2)
                    outputs[("disp", i)] = nn.sigmoid(
                        wunpack(d, 2).astype(jnp.float32))
                else:
                    disp = Conv3x3(self.num_output_channels,
                                   dtype=self.dtype,
                                   name=f"dispconv_{i}")(x)
                    outputs[("disp", i)] = nn.sigmoid(
                        disp.astype(jnp.float32))

        def wconv(segs, cout, name, f, seg_ch=None):
            k, b = _ConvBlockParams(cout, sum(
                t.shape[-1] // f for t in segs) if seg_ch is None
                else sum(seg_ch), name=name)()
            return wpack_conv3x3_reflect(
                segs if len(segs) > 1 else segs[0],
                k.astype(self.dtype), b.astype(self.dtype), f=f,
                segment_channels=seg_ch)

        def wdisp(xh, ch, f, i):
            k, b = _Conv3x3Params(self.num_output_channels, ch,
                                  name=f"dispconv_{i}")()
            if self.num_output_channels == 1 and xh.shape[2] >= 64:
                # tap-split head: 6x fewer executed MACs than the
                # phase-blocked conv at f=8. Standalone it wins at all
                # shapes (scripts/bench_dispconv.py: full igrad
                # 5.4 -> 2.5 ms), but at STEP level the crop-shaped
                # PGD inner loop measured faster keeping the phase
                # conv (120.9 vs 119.6 imgs/s — the small-M conv
                # fuses with the sigmoid/objective epilogue where the
                # nine shifted adds do not), so only full frames
                # (M >= 64) take the tap-split.
                d = wpack_dispconv(xh, k.astype(self.dtype),
                                   b.astype(self.dtype), f=f)
            else:
                d = wpack_conv3x3_reflect(xh, k.astype(self.dtype),
                                          b.astype(self.dtype), f=f)
            return nn.sigmoid(wunpack(d, f).astype(jnp.float32))

        # f-schedule: f doubles through each wlane upsample so every
        # conv input is 128-256 lanes and no relayout ever happens at
        # the two largest scales. Any width the encoder accepts
        # (multiples of 32) satisfies the schedule; guard for clarity.
        W = x.shape[2]
        if W % 8 or W // 8 < 1:
            raise ValueError(f"wpacked decoder needs W/4 divisible by "
                             f"2 (got scale-2 width {W})")

        # i=1: enter packed at f=2 (64ch -> 128 lanes)
        xh = nn.elu(wconv([wpack(x, 2)], NUM_CH_DEC[1],
                          "upconv_1_0", 2))
        # upsample FUSED into the conv (wpack_up2conv3x3_reflect): the
        # (B,2H,M,2f*C) intermediate, its forward lane/row broadcasts,
        # and their reduce_sum adjoints never exist, and the up-path
        # conv reads f*C instead of 2f*C input lanes
        ch_up = NUM_CH_DEC[1]
        if self.use_skips:
            skip = input_features[0].astype(self.dtype)
            skip_ch = (skip.shape[-1] // 4 if self.packed_skip0
                       else skip.shape[-1])
            k1, b1 = _ConvBlockParams(
                NUM_CH_DEC[1], ch_up + skip_ch,
                name="upconv_1_1")()
            k1 = k1.astype(self.dtype)
            y = wpack_up2conv3x3_reflect(xh, k1[:, :, :ch_up], f=2)
            skip4 = skip if self.packed_skip0 else wpack(skip, 4)
            y = y + wpack_conv3x3_reflect(skip4,
                                          k1[:, :, ch_up:], f=4)
            xh1 = nn.elu(y + jnp.tile(b1, 4).astype(self.dtype))
        else:
            k1, b1 = _ConvBlockParams(NUM_CH_DEC[1], ch_up,
                                      name="upconv_1_1")()
            xh1 = nn.elu(wpack_up2conv3x3_reflect(
                xh, k1.astype(self.dtype), b1.astype(self.dtype),
                f=2))
        if 1 in self.scales:
            outputs[("disp", 1)] = wdisp(xh1, NUM_CH_DEC[1], 4, 1)

        # i=0: f=4 -> (fused up2conv) f=8, no repacks
        xh0 = nn.elu(wconv([xh1], NUM_CH_DEC[0], "upconv_0_0", 4))
        k0, b0 = _ConvBlockParams(NUM_CH_DEC[0], NUM_CH_DEC[0],
                                  name="upconv_0_1")()
        xh0 = nn.elu(wpack_up2conv3x3_reflect(
            xh0, k0.astype(self.dtype), b0.astype(self.dtype), f=4))
        if 0 in self.scales:
            outputs[("disp", 0)] = wdisp(xh0, NUM_CH_DEC[0], 8, 0)
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
