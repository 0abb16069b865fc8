"""Pseudo-LiDAR / ground plane + matching-encoder converter tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.data.pseudo_lidar import (
    extract_ransac, fit_ground_plane, project_depth_to_points,
    project_disp_to_points, save_pseudo_lidar, write_plane_file,
)
from depthmodelhardening_tpu.models.matching_encoder import (
    ResnetEncoderMatching,
)
from depthmodelhardening_tpu.models.torch_import import (
    convert_matching_encoder,
)
from depthmodelhardening_tpu.physics.calibration import Calibration


def test_project_disp_roundtrip():
    """A flat disparity plane lands at the expected depth, in front of
    the sensor, below max_high."""
    calib = Calibration.default()
    # native-size frame so projected points sit near the road, not sky
    disp = np.zeros((375, 1242), np.float32)
    disp[200:300, 500:800] = 10.0
    cloud = project_disp_to_points(calib, disp, max_high=5.0)
    assert cloud.shape[1] == 3
    assert len(cloud) > 0
    expected_depth = calib.f_u * 0.54 / 10.0
    # velodyne x is forward ~ rect z
    assert abs(np.median(cloud[:, 0]) - expected_depth) < 2.0


def test_fit_ground_plane_flat_road():
    """Points on the y=1.65 rect plane recover w ~ (0,-1,0), h ~ 1.65."""
    calib = Calibration.default()
    rs = np.random.RandomState(0)
    xs = rs.uniform(-10, 10, 500)
    zs = rs.uniform(1, 39, 500)
    ys = np.full(500, 1.65) + rs.normal(0, 0.005, 500)
    rect = np.stack([xs, ys, zs], axis=1)
    velo = calib.rect_to_velo(rect)
    w, h = fit_ground_plane(np.concatenate(
        [velo, np.ones((500, 1))], 1), calib)
    assert abs(h - 1.65) < 0.05
    assert abs(w[1] + 1.0) < 0.01


def test_fit_ground_plane_fallback_empty():
    calib = Calibration.default()
    pc = np.zeros((0, 4), np.float32)
    w, h = fit_ground_plane(pc, calib)
    np.testing.assert_allclose(w, [0, -1, 0])
    assert h == 1.65


def test_plane_file_and_extract(tmp_path):
    calib = Calibration.default()
    w, h = np.array([0.0, -1.0, 0.0]), 1.65
    write_plane_file(str(tmp_path / "000001.txt"), w, h)
    txt = (tmp_path / "000001.txt").read_text()
    assert txt.startswith("# Plane")
    assert "-1.0" in txt or "-1e" in txt or "e+00" in txt


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _to_torch_key(path):
    """Our flax path -> reference matching-encoder state-dict key."""
    mod = path[0]
    col_leaf = path[-1]
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    leaf = leaf_map[col_leaf]
    if mod == "conv1":
        return f"layer0.0.{leaf}"
    if mod == "bn1":
        return f"layer0.1.{leaf}"
    if mod.startswith("layer1_"):
        b = mod.split("_")[1]
        inner = path[1] if len(path) > 2 else ""
        inner = inner.replace("downsample_", "downsample.")
        return f"layer1.1.{b}.{inner}.{leaf}"
    if mod.startswith(("layer2_", "layer3_", "layer4_")):
        stage, b = mod.split("_")
        inner = path[1] if len(path) > 2 else ""
        inner = inner.replace("downsample_", "downsample.")
        return f"{stage}.{b}.{inner}.{leaf}"
    if mod in ("prematching_conv", "reduce_conv"):
        return f"{mod}.0.{leaf}"
    raise KeyError(path)


def test_convert_matching_encoder_roundtrip():
    """Build the torch-style state dict FROM our init variables via the
    inverse name mapping, convert it, and require an identical tree."""
    H, W, D = 64, 96, 4
    enc = ResnetEncoderMatching(num_layers=18, input_height=H,
                                input_width=W, num_depth_bins=D)
    rng = jax.random.PRNGKey(0)
    cur = jnp.zeros((1, H, W, 3))
    lookup = jnp.zeros((1, 1, H, W, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    K = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    variables = enc.init(rng, cur, lookup, poses, K, K, train=False)

    sd = {}
    for col, leaf_tf in (("params", True), ("batch_stats", False)):
        for path, v in _flatten(variables[col]).items():
            key = _to_torch_key(path)
            arr = np.asarray(v)
            if path[-1] == "kernel":
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
            sd[key] = arr
    sd["min_depth_bin"] = 0.1
    sd["max_depth_bin"] = 20.0

    converted, meta = convert_matching_encoder(sd)
    assert meta["min_depth_bin"] == 0.1

    got = _flatten(converted["params"])
    want = _flatten(variables["params"])
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]), err_msg=str(k))
    got_s = _flatten(converted["batch_stats"])
    want_s = _flatten(variables["batch_stats"])
    assert set(got_s.keys()) == set(want_s.keys())


def test_load_manydepth_reference(tmp_path):
    """File-level ManyDepth checkpoint load: converted variables must
    drive the model to finite disparities."""
    import torch

    from depthmodelhardening_tpu.models.wrappers import (
        ManyDepthModel, quarter_intrinsics,
    )
    from depthmodelhardening_tpu.training.checkpoints import (
        load_manydepth_reference,
    )

    H, W, D = 64, 96, 96
    enc = ResnetEncoderMatching(num_layers=18, input_height=H,
                                input_width=W, num_depth_bins=D)
    rng = jax.random.PRNGKey(0)
    cur = jnp.zeros((1, H, W, 3))
    lookup = jnp.zeros((1, 1, H, W, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    Ke = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    variables = enc.init(rng, cur, lookup, poses, Ke, Ke, train=False)

    sd = {}
    for col in ("params", "batch_stats"):
        for path, v in _flatten(variables[col]).items():
            arr = np.asarray(v)
            if path[-1] == "kernel":
                arr = np.transpose(arr, (3, 2, 0, 1))
            sd[_to_torch_key(path)] = torch.from_numpy(np.array(arr))
    sd["height"] = H
    sd["width"] = W
    sd["min_depth_bin"] = 0.1
    sd["max_depth_bin"] = 20.0
    torch.save(sd, tmp_path / "encoder.pth")

    # decoder from a monodepth init
    from depthmodelhardening_tpu.models.torch_import import (
        export_depth_decoder,
    )
    from depthmodelhardening_tpu.models.wrappers import init_monodepth2

    m2, v2 = init_monodepth2(jax.random.PRNGKey(1), H, W)
    dec_sd = export_depth_decoder({"params": v2["params"]["decoder"]})
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in dec_sd.items()}, tmp_path / "depth.pth")

    model, vars_, meta = load_manydepth_reference(str(tmp_path))
    assert meta["height"] == H
    Kn = np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    K, invK = quarter_intrinsics(Kn, W, H)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    disp = model.apply(vars_, x, jnp.broadcast_to(K, (1, 4, 4)),
                       jnp.broadcast_to(invK, (1, 4, 4)),
                       min_depth_bin=0.1, max_depth_bin=20.0)
    assert disp.shape == (1, H, W, 1)
    assert np.isfinite(np.asarray(disp)).all()


def test_generate_disparity_from_velo():
    from depthmodelhardening_tpu.data.pseudo_lidar import (
        generate_disparity_from_velo,
    )

    calib = Calibration.default()
    rs = np.random.RandomState(0)
    rect = np.stack([rs.uniform(-5, 5, 200), rs.uniform(0, 1.5, 200),
                     rs.uniform(5, 40, 200)], 1)
    velo = calib.rect_to_velo(rect)
    disp = generate_disparity_from_velo(velo, 375, 1242, calib)
    assert disp.shape == (375, 1242)
    v = disp[disp > 0]
    assert len(v) > 50
    # holes carry the reference's -1-depth convention (negative disp)
    assert (disp < 0).sum() > 0
    assert v.max() <= calib.f_u * 0.54 / 5.0 + 1.0
