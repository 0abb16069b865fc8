"""SimSiam contrastive head (flax.linen).

Reference: DepthNetworks/monodepth2/contrastive.py:6-93 (byte-identical in
all three model trees): global-average-pool the deepest encoder feature
(512-d), 3-layer projector -> 1000-d (final BN affine-free), 2-layer
predictor -> 1000-d, symmetric negative cosine loss with stop-gradient on
the projector outputs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _cosine(a, b, eps=1e-8):
    """torch nn.CosineSimilarity(dim=1): a.b / max(|a||b|, eps) per row."""
    na = jnp.linalg.norm(a, axis=1)
    nb = jnp.linalg.norm(b, axis=1)
    return jnp.sum(a * b, axis=1) / jnp.maximum(na * nb, eps)


class SimSiam(nn.Module):
    dim: int = 1000
    pred_dim: int = 512
    feat_dim: int = 512

    @nn.compact
    def __call__(self, features_aug, features_ben, train: bool = True):
        """Args: the two encoder feature lists (adv view, benign view).
        Returns the scalar contrastive loss."""
        # avgpool (B, 512); encoder features may be bf16 — head runs f32
        x1 = jnp.mean(features_aug[-1], axis=(1, 2)).astype(jnp.float32)
        x2 = jnp.mean(features_ben[-1], axis=(1, 2)).astype(jnp.float32)

        proj_0 = nn.Dense(self.feat_dim, use_bias=False, name="projector_0")
        proj_1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="projector_1")
        proj_3 = nn.Dense(self.feat_dim, use_bias=False, name="projector_3")
        proj_4 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="projector_4")
        proj_6 = nn.Dense(self.dim, use_bias=False, name="projector_6")
        proj_7 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_bias=False,
                              use_scale=False, name="projector_7")
        pred_0 = nn.Dense(self.pred_dim, use_bias=False, name="predictor_0")
        pred_1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="predictor_1")
        pred_3 = nn.Dense(self.dim, name="predictor_3")

        ura = not train

        def projector(z):
            z = nn.relu(proj_1(proj_0(z), use_running_average=ura))
            z = nn.relu(proj_4(proj_3(z), use_running_average=ura))
            return proj_7(proj_6(z), use_running_average=ura)

        def predictor(z):
            z = nn.relu(pred_1(pred_0(z), use_running_average=ura))
            return pred_3(z)

        z1 = projector(x1)
        z2 = projector(x2)
        p1 = predictor(z1)
        p2 = predictor(z2)

        # stop-gradient on targets (contrastive.py:89)
        z1s = jax.lax.stop_gradient(z1)
        z2s = jax.lax.stop_gradient(z2)
        loss = -(jnp.mean(_cosine(p1, z2s)) +
                 jnp.mean(_cosine(p2, z1s))) * 0.5
        return loss
