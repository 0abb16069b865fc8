"""Fused-SGBM depth-hint precomputation.

Re-design of DepthNetworks/depth-hints/precompute_depth_hints.py:42-263:
12 OpenCV SGBM matchers (4 disparity counts x 3 block sizes, :42-62)
each produce a candidate depth map for a stereo pair (focal*baseline/
disp, baseline 0.1 in the normalized-intrinsics frame, :120-152); the
candidates are fused per pixel by warping the other eye through each
candidate depth and keeping the depth with the lowest 0.85*SSIM+0.15*L1
reprojection loss (:246-253).

Split: SGBM runs on host (cv2, per image-pair); the 12-way reprojection
fusion is a single jitted computation on device. Hints are saved as
<save_path>/<sequence>/image_0{2,3}/<frame>.npy like the reference so
the dataset loader is path-compatible (depth-hints/datasets/
mono_dataset.py:368-388).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import reproject_coords
from ..ops.losses import reprojection_loss
from ..ops.sampling import grid_sample

BASELINE = 0.1  # normalized-frame baseline (precompute_depth_hints.py:120)


def make_stereo_matchers():
    """The 12 SGBM matchers (precompute_depth_hints.py:42-62)."""
    import cv2

    matchers = []
    for block_size in (1, 2, 3):
        for num_disp in (64, 96, 128, 160):
            sad = 3
            matchers.append(cv2.StereoSGBM_create(
                preFilterCap=63, P1=sad * sad * 4, P2=sad * sad * 32,
                minDisparity=0, numDisparities=num_disp,
                uniquenessRatio=10, speckleWindowSize=100,
                speckleRange=16, blockSize=block_size))
    return matchers


def scaled_K(height: int, width: int):
    K = np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    K[0] *= width
    K[1] *= height
    return K, np.linalg.pinv(K)


def compute_candidate_depths(base_image: np.ndarray,
                             lookup_image: np.ndarray,
                             focal: float,
                             reverse: bool = False) -> np.ndarray:
    """(12, H, W) candidate depths from SGBM disparities
    (precompute_depth_hints.py:127-152). Images are uint8 HWC; set
    reverse when the base image is the right eye."""
    if reverse:
        base_image = base_image[:, ::-1]
        lookup_image = lookup_image[:, ::-1]
    disps = []
    for matcher in make_stereo_matchers():
        disp = matcher.compute(base_image, lookup_image) / 16.0
        if reverse:
            disp = disp[:, ::-1]
        disps.append(disp)
    disps = np.stack(disps).astype(np.float32)
    return focal * BASELINE / (disps + 1e-7) * (disps > 0)


@jax.jit
def _fuse(depths, base, lookup, K, invK, T):
    """Pick the per-pixel depth with the lowest reprojection loss
    (precompute_depth_hints.py:246-253). depths (12,H,W,1);
    base/lookup (12,H,W,3)."""
    grid = reproject_coords(depths, invK, K, T)
    sampled = grid_sample(lookup, grid, padding_mode="border",
                          align_corners=True)
    losses = reprojection_loss(sampled, base)  # (12, H, W, 1)
    best = jnp.argmin(losses, axis=0)  # (H, W, 1)
    return jnp.take_along_axis(depths, best[None], axis=0)[0]


def fuse_depths(depths: np.ndarray, base_image: np.ndarray,
                lookup_image: np.ndarray, T: np.ndarray,
                height: int, width: int) -> np.ndarray:
    """depths (12,H,W), images float [0,1] HWC -> fused (H,W)."""
    K, invK = scaled_K(height, width)
    n = depths.shape[0]
    out = _fuse(
        jnp.asarray(depths)[..., None],
        jnp.broadcast_to(jnp.asarray(base_image), (n,) +
                         base_image.shape),
        jnp.broadcast_to(jnp.asarray(lookup_image), (n,) +
                         lookup_image.shape),
        jnp.broadcast_to(jnp.asarray(K), (n, 4, 4)),
        jnp.broadcast_to(jnp.asarray(invK), (n, 4, 4)),
        jnp.broadcast_to(jnp.asarray(T, jnp.float32), (n, 4, 4)))
    return np.asarray(out)[..., 0]


def compute_depth_hint(base_image: np.ndarray, lookup_image: np.ndarray,
                       side: str = "l", height: int = 320,
                       width: int = 1024) -> np.ndarray:
    """Full hint for one stereo pair: SGBM candidates + fusion.

    base/lookup: uint8 HWC at (height, width). side: which eye the base
    image is ("l"/"r"); the extrinsic sign follows the reference
    (precompute_depth_hints.py:160-176: -baseline for left).
    """
    K, _ = scaled_K(height, width)
    reverse = side == "r"
    depths = compute_candidate_depths(base_image, lookup_image,
                                      focal=float(K[0, 0]),
                                      reverse=reverse)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = (-1.0 if side == "l" else 1.0) * BASELINE
    return fuse_depths(depths, base_image.astype(np.float32) / 255.0,
                       lookup_image.astype(np.float32) / 255.0, T,
                       height, width)


def precompute_for_split(data_path: str, filenames: Sequence[str],
                         save_path: Optional[str] = None,
                         height: int = 320, width: int = 1024,
                         overwrite: bool = False) -> List[str]:
    """Batch driver (precompute_depth_hints.py:206-263). Returns the
    list of written .npy paths."""
    from PIL import Image

    save_path = save_path or os.path.join(data_path, "depth_hints")
    written = []
    for line in filenames:
        sequence, frame, side = line.split()
        cam = "image_02" if side == "l" else "image_03"
        other = "image_03" if side == "l" else "image_02"
        out_dir = os.path.join(save_path, sequence, cam)
        out_file = os.path.join(out_dir, f"{int(frame):010d}.npy")
        if not overwrite and os.path.isfile(out_file):
            continue

        def load(c):
            p = os.path.join(data_path, sequence, c, "data",
                             f"{int(frame):010d}.png")
            with open(p, "rb") as f:
                img = Image.open(f).convert("RGB")
            return np.asarray(img.resize((width, height),
                                         Image.LANCZOS))

        hint = compute_depth_hint(load(cam), load(other), side=side,
                                  height=height, width=width)
        os.makedirs(out_dir, exist_ok=True)
        np.save(out_file, hint[None].astype(np.float32))
        written.append(out_file)
    return written


def load_depth_hint(save_path: str, sequence: str, frame: int,
                    side: str, do_flip: bool = False) -> np.ndarray:
    """Load a hint like the dataset does (depth-hints/datasets/
    mono_dataset.py:368-388): (H, W) float32, horizontally flipped when
    the item is flipped."""
    cam = "image_02" if side == "l" else "image_03"
    path = os.path.join(save_path, sequence, cam, f"{frame:010d}.npy")
    hint = np.load(path)[0]
    if do_flip:
        hint = hint[:, ::-1]
    return hint.astype(np.float32)
