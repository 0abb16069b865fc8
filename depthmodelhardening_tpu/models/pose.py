"""Pose networks (flax.linen, NHWC).

Reference:
  * PoseDecoder — DepthNetworks/monodepth2/networks/pose_decoder.py:14-54
  * PoseCNN     — networks/pose_cnn.py:13-50

Both emit (axisangle, translation) scaled by 0.01 with shapes
(B, num_frames_to_predict_for, 1, 3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class PoseDecoder(nn.Module):
    num_input_features: int = 1
    num_frames_to_predict_for: Optional[int] = 2
    stride: int = 1

    @nn.compact
    def __call__(self, input_features):
        """input_features: list (len num_input_features) of encoder feature
        lists; only the last (deepest) feature of each is used."""
        n_pred = self.num_frames_to_predict_for
        if n_pred is None:
            n_pred = self.num_input_features - 1

        last_features = [f[-1] for f in input_features]
        squeeze = nn.Conv(256, (1, 1), name="squeeze")
        cat = jnp.concatenate([nn.relu(squeeze(f)) for f in last_features],
                              axis=-1)

        out = cat
        out = nn.relu(nn.Conv(256, (3, 3), strides=self.stride,
                              padding=((1, 1), (1, 1)), name="pose_0")(out))
        out = nn.relu(nn.Conv(256, (3, 3), strides=self.stride,
                              padding=((1, 1), (1, 1)), name="pose_1")(out))
        out = nn.Conv(6 * n_pred, (1, 1), name="pose_2")(out)

        out = jnp.mean(out, axis=(1, 2))  # (B, 6*n_pred)
        out = 0.01 * out.reshape(-1, n_pred, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    num_input_frames: int = 2

    @nn.compact
    def __call__(self, x):
        specs = [(16, 7, 2, 3), (32, 5, 2, 2), (64, 3, 2, 1), (128, 3, 2, 1),
                 (256, 3, 2, 1), (256, 3, 2, 1), (256, 3, 2, 1)]
        for i, (ch, k, s, p) in enumerate(specs):
            x = nn.relu(nn.Conv(ch, (k, k), strides=s,
                                padding=((p, p), (p, p)),
                                name=f"convs_{i}")(x))
        x = nn.Conv(6 * (self.num_input_frames - 1), (1, 1),
                    name="pose_conv")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return x[..., :3], x[..., 3:]
