"""Differentiable camera geometry, TPU-native (pure jnp, static shapes).

Semantics match the reference pipeline (citations into /root/reference):
  * disp_to_depth                 — DepthNetworks/monodepth2/layers.py:16-25
  * rot_from_axisangle            — layers.py:64-103
  * get_translation_matrix        — layers.py:48-61
  * transformation_from_parameters— layers.py:28-45
  * BackprojectDepth / Project3D  — layers.py:139-198

Design notes (TPU-first):
  * Images are NHWC; depth/disparity maps are (B, H, W, 1).
  * The pixel grid is a compile-time constant folded by XLA; backproject +
    project compose into two small (3x3 / 3x4) einsums over N = H*W points,
    which XLA fuses with the downstream bilinear gather.
  * Everything is batched with leading B and works under vmap/jit/pjit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 4x4 / 3xN geometry matmuls are tiny but fidelity-critical: force f32
# accumulation so TPU bf16 matmul defaults never quantize camera math.
_F32 = jax.lax.Precision.HIGHEST


def disp_to_depth(disp, min_depth, max_depth):
    """Convert a network's sigmoid output into (scaled_disp, depth).

    Mirrors layers.py:16-25: depth = 1 / (1/max + (1/min - 1/max) * disp).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec):
    """Axis-angle (B, 1, 3) or (B, 3) -> rotation as 4x4 matrices (B, 4, 4).

    Rodrigues formula; matches layers.py:64-103 including the 1e-7 guard.
    """
    vec = vec.reshape(vec.shape[0], 3)
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[:, 0]
    sa = jnp.sin(angle)[:, 0]
    C = 1.0 - ca

    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    B = vec.shape[0]
    zeros = jnp.zeros((B,), vec.dtype)
    ones = jnp.ones((B,), vec.dtype)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs,    zxC + ys,    zeros,
            xyC + zs,    y * yC + ca, yzC - xs,    zeros,
            zxC - ys,    yzC + xs,    z * zC + ca, zeros,
            zeros,       zeros,       zeros,       ones,
        ],
        axis=-1,
    ).reshape(B, 4, 4)
    return rot


def get_translation_matrix(translation):
    """Translation vectors (B, 3) (or (B,1,3)) -> 4x4 matrices (B, 4, 4)."""
    t = translation.reshape(translation.shape[0], 3)
    B = t.shape[0]
    T = jnp.tile(jnp.eye(4, dtype=t.dtype)[None], (B, 1, 1))
    T = T.at[:, :3, 3].set(t)
    return T


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axisangle, translation) network output -> 4x4 camera transform.

    Matches layers.py:28-45: when invert, R <- R^T, t <- -t, M = R @ T;
    otherwise M = T @ R.
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.matmul(R, T, precision=_F32)
    return jnp.matmul(T, R, precision=_F32)


@functools.lru_cache(maxsize=32)
def _pixel_grid_np(height: int, width: int):
    import numpy as np

    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    ones = np.ones_like(xs)
    return np.stack([xs, ys, ones], 0).reshape(3, -1).astype("float32")


def pixel_grid(height: int, width: int):
    """Homogeneous pixel coordinates, (3, H*W) with rows [x, y, 1].

    Compile-time constant (layers.py:149-161 builds the same grid as a
    buffer); XLA folds it into the surrounding computation.
    """
    return jnp.asarray(_pixel_grid_np(height, width))


def backproject_depth(depth, inv_K):
    """Depth map -> homogeneous camera-space point cloud.

    Args:
      depth: (B, H, W, 1).
      inv_K: (B, 4, 4) inverse intrinsics.
    Returns:
      (B, 4, H*W) points: inv_K[:3,:3] @ pix * depth, with a ones row.

    Matches layers.py:163-168.
    """
    B, H, W, _ = depth.shape
    pix = pixel_grid(H, W).astype(depth.dtype)  # (3, N)
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision=_F32)  # (B, 3, N)
    cam = cam * depth.reshape(B, 1, H * W)
    ones = jnp.ones((B, 1, H * W), depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points, K, T, height: int, width: int, eps: float = 1e-7):
    """Project homogeneous 3-D points into a camera at extrinsics T.

    Args:
      points: (B, 4, N) with N == height*width.
      K, T: (B, 4, 4).
    Returns:
      Normalized sampling grid (B, H, W, 2) in [-1, 1] (align_corners=True
      convention, i.e. -1/-1 is the *center* of the top-left pixel).

    Matches layers.py:182-198.
    """
    B = points.shape[0]
    P = jnp.matmul(K, T, precision=_F32)[:, :3, :]  # (B, 3, 4)
    cam = jnp.einsum("bij,bjn->bin", P, points, precision=_F32)  # (B, 3, N)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)  # (B, 2, N)
    pix = pix.reshape(B, 2, height, width)
    pix = jnp.moveaxis(pix, 1, -1)  # (B, H, W, 2) as (x, y)
    scale = jnp.asarray([width - 1, height - 1], pix.dtype)
    return (pix / scale - 0.5) * 2.0


def reproject_coords(depth, inv_K, K, T, eps: float = 1e-7):
    """Fused backproject->transform->project.

    Args:
      depth: (B, H, W, 1) depth in the source camera.
      inv_K, K, T: (B, 4, 4).
    Returns:
      (B, H, W, 2) normalized grid for sampling the *other* view.

    Equivalent to BackprojectDepth followed by Project3D
    (trainer.py:508-519) but composed into a single pair of einsums so
    XLA keeps the (4, N) intermediate fused.
    """
    B, H, W, _ = depth.shape
    points = backproject_depth(depth, inv_K)
    return project_3d(points, K, T, H, W, eps)
