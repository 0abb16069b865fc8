"""Evaluation suite: metrics pipeline, sweeps, pose ATE, gt export,
clean eval, object-image prep, CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_attacks import TinyDepthNet

from depthmodelhardening_tpu.data.object_images import process_car_img
from depthmodelhardening_tpu.data.synthetic import make_car_object, make_scene
from depthmodelhardening_tpu.evaluation.attack_eval import (
    AttackEvalConfig, build_attack, evaluate_attacks,
)
from depthmodelhardening_tpu.evaluation.clean_eval import (
    CleanEvalConfig, batch_post_process_disparity, eigen_crop_mask,
    evaluate_clean,
)
from depthmodelhardening_tpu.evaluation.pose_eval import (
    compute_ate, dump_xyz, local_gt_poses, trajectory_ates,
)
from depthmodelhardening_tpu.evaluation.sweeps import (
    attack_steps_sweep, crosscheck_matrix,
)

H, W = 96, 320
ORI_H, ORI_W = 375, 1242


class _Pred:
    def __init__(self, seed=7):
        t = TinyDepthNet(jax.random.PRNGKey(seed))
        self.apply_fn = t.predict
        self.variables = t.variables

    def __call__(self, x):
        return self.apply_fn(self.variables, x)


@pytest.fixture(scope="module")
def pred():
    return _Pred()


def _scenes():
    def gen():
        for i in range(2):
            yield make_scene(1, ORI_H, ORI_W, seed=i)

    return gen


def _cfg(**kw):
    base = dict(norm_type="l_inf", step=1, batch_size=2, eval_count=2,
                scene_h=H, scene_w=W)
    base.update(kw)
    return AttackEvalConfig(**base)


@pytest.mark.slow
def test_attack_steps_sweep(pred):
    obj, mask = make_car_object(300, 200, seed=3)
    res = attack_steps_sweep(pred, jnp.asarray(obj), jnp.asarray(mask),
                             _scenes(), _cfg(), candi_steps=(1, 2))
    assert set(res.keys()) == {1, 2}
    for v in res.values():
        assert np.isfinite(v["mean"]["rmse"])


@pytest.mark.slow
def test_crosscheck_matrix(pred):
    obj, mask = make_car_object(300, 200, seed=3)
    preds = {"a": pred, "b": _Pred(seed=9)}
    res = crosscheck_matrix(preds, jnp.asarray(obj), jnp.asarray(mask),
                            _scenes(), _cfg())
    assert set(res.keys()) == {"a", "b"}
    assert set(res["a"].keys()) == {"a", "b"}
    # self-attack and transfer numbers must both be finite
    assert np.isfinite(res["a"]["b"]["mean"]["abs_rel"])


def test_pose_ate_zero_for_exact_prediction():
    """Perfect pose predictions give ~zero ATE."""
    rs = np.random.RandomState(0)
    n = 12
    global_poses = [np.eye(4)]
    for _ in range(n - 1):
        T = np.eye(4)
        T[:3, 3] = rs.uniform(-0.2, 0.2, 3) + [0, 0, 1.0]
        global_poses.append(global_poses[-1] @ T)
    g34 = np.stack([p[:3] for p in global_poses])
    pred_local = local_gt_poses(g34)
    mean_ate, std_ate, ates = trajectory_ates(pred_local, g34)
    assert mean_ate < 1e-9


def test_compute_ate_scale_invariance():
    """Origin-anchored trajectories: a global scale is fully absorbed by
    the least-squares scale factor (evaluate_pose.py:29-46)."""
    xyz = np.vstack([np.zeros((1, 3)),
                     np.cumsum(np.ones((5, 3)), axis=0)])
    assert compute_ate(xyz, xyz * 3.0) < 1e-12


def test_eigen_crop_and_postprocess():
    m = eigen_crop_mask(375, 1242)
    assert m[153:371, 44:1197].all()
    assert not m[:152].any()
    l = np.random.RandomState(0).rand(1, 20, 30).astype(np.float32)
    r = np.random.RandomState(1).rand(1, 20, 30).astype(np.float32)
    out = batch_post_process_disparity(l, r)
    assert out.shape == l.shape
    # left edge: l_mask==1, r_mask==0 -> the flipped prediction r_disp
    # (evaluate_depth.py:102-110)
    np.testing.assert_allclose(out[:, :, 0], r[:, :, 0], atol=1e-6)


def test_evaluate_clean_runs(pred):
    rs = np.random.RandomState(0)

    def pairs():
        for i in range(2):
            img = rs.rand(H, W, 3).astype(np.float32)
            gt = np.zeros((188, 621), np.float32)
            gt[100:150, 100:500] = rs.uniform(2, 40, (50, 400))
            yield img, gt

    metrics, ratios = evaluate_clean(pred, pairs(),
                                     CleanEvalConfig(eval_stereo=True))
    for k, v in metrics.items():
        assert np.isfinite(v), k


def test_process_car_img(tmp_path):
    from PIL import Image

    img = np.zeros((100, 200, 3), np.uint8)
    img[20:80, 40:160] = 200
    Image.fromarray(img).save(tmp_path / "Car.png")
    mask = np.zeros((100, 200), np.uint8)
    mask[20:80, 40:160] = 255
    Image.fromarray(mask).save(tmp_path / "Car_CarMask.png")

    obj, car_mask, paint = process_car_img(str(tmp_path / "Car.png"),
                                           "-2")
    assert obj.shape == (1, 150, 300, 3)
    assert car_mask.shape == (1, 150, 300, 1)
    assert set(np.unique(car_mask)) <= {0.0, 1.0}
    np.testing.assert_allclose(paint, 0.5)


def test_cli_infer(tmp_path):
    from PIL import Image

    from depthmodelhardening_tpu.cli.main import main

    p = tmp_path / "scene.png"
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (60, 200, 3), np.uint8)).save(str(p))
    main(["infer", "--image", str(p), "--height", "64",
          "--width", "192"])
    assert (tmp_path / "scene_disp.npy").exists()
    assert (tmp_path / "scene_disp.jpeg").exists()
