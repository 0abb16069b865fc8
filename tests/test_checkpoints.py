"""Orbax checkpoint roundtrip + reference .pth export/import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmodelhardening_tpu.data.synthetic import make_car_object
from depthmodelhardening_tpu.models.wrappers import (
    init_monodepth2, predictor_from,
)
from depthmodelhardening_tpu.training.checkpoints import (
    export_reference_pth, latest_step, load_reference_pth,
    restore_state, save_options, save_state,
)
from depthmodelhardening_tpu.training.config import DistillConfig
from depthmodelhardening_tpu.training.distill import DistillTrainer

H, W = 64, 192


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    obj, mask = make_car_object(36, 24)
    model, variables = init_monodepth2(jax.random.PRNGKey(7), H, W)
    teacher = predictor_from(model, variables)
    cfg = DistillConfig(adv_type="object", steps=1, batch_size=2,
                        scene_h=H, scene_w=W, ori_h=96, ori_w=320)
    tr = DistillTrainer(cfg, jax.random.PRNGKey(0), obj, mask, teacher)
    state = tr.make_state()

    ckpt = tmp_path / "ckpts"
    save_state(str(ckpt), 0, state)
    assert latest_step(str(ckpt)) == 0

    # perturb, then restore and compare to the saved values
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params))
    restored = restore_state(str(ckpt), perturbed)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_checkpoint_pruning(tmp_path):
    # save_state is structure-agnostic (orbax StandardCheckpointer on a
    # pytree); a tiny state exercises the pruning logic without paying
    # for a full trainer init on every run.
    state = {"params": {"w": jnp.ones((4, 4))},
             "opt": {"mu": jnp.zeros((4, 4))}}
    ckpt = tmp_path / "ckpts"
    for s in range(4):
        save_state(str(ckpt), s, state, keep=2)
    import os

    kept = sorted(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert kept == [2, 3]


def test_reference_pth_roundtrip(tmp_path):
    """Export flax weights to reference-format .pth and re-import: the
    model must produce identical disparities."""
    model, variables = init_monodepth2(jax.random.PRNGKey(3), H, W)
    folder = export_reference_pth(str(tmp_path), 0, variables,
                                  height=H, width=W)
    loaded, meta = load_reference_pth(folder, model, height=H, width=W)
    assert meta["height"] == H and meta["width"] == W

    x = jax.random.uniform(jax.random.PRNGKey(4), (1, H, W, 3))
    d1 = model.apply(variables, x, train=False)
    d2 = model.apply(loaded, x, train=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               atol=1e-6)


def test_save_options(tmp_path):
    cfg = DistillConfig()
    save_options(str(tmp_path), cfg)
    import json

    with open(tmp_path / "opt.json") as f:
        opts = json.load(f)
    assert opts["adv_type"] == "object"
