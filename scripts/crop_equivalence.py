"""Crop-objective equivalence table (docs/FIDELITY.md §N).

Quantitative side-by-side of the width-cropped attack objective
(attack_crop_w=512) vs the reference full-frame objective
(attack_crop_w=None): same scenes, same model, same seeds — optimize
the adversarial texture with each objective, then measure the final
full-frame attack effect with the evaluate_attacks metric suite
(masked depth-error 8-tuple, evaluate_depth.py:57-99, scaled 5.4,
clamp [1e-3, 80]). Finals/metrics are always full-frame; only the
PGD-loop model view differs.

Run on the TPU:  PYTHONPATH=/root/.axon_site:/root/repo \
                 python scripts/crop_equivalence.py
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from depthmodelhardening_tpu.attacks.base import PhysObjAttackConfig
from depthmodelhardening_tpu.attacks.pgd_object import PGDObjectAttack
from depthmodelhardening_tpu.data.synthetic import (
    make_car_object, make_scene,
)
from depthmodelhardening_tpu.evaluation.attack_eval import (
    METRIC_NAMES, _batch_metrics,
)
from depthmodelhardening_tpu.models.wrappers import (
    init_monodepth2, predictor_from,
)
from depthmodelhardening_tpu.physics.eot import EVAL_DIST_RANGE

BATCH = 12
N_SCENES = 6
H, W = 320, 1024
ORI_H, ORI_W = 375, 1242


def main():
    import sys

    model, variables = init_monodepth2(jax.random.PRNGKey(0), H, W,
                                       dtype=jnp.bfloat16)
    if "--weights" in sys.argv:
        # Re-measure the table on TRAINED weights (VERDICT r3 #4): a
        # hardened student saved by scripts/longrun_demo.py --save.
        # The wpack/s2d training flags keep the same parameter tree,
        # so the msgpack deserializes straight into the naive model.
        import flax.serialization

        i = sys.argv.index("--weights")
        path = sys.argv[i + 1]
        del sys.argv[i:i + 2]
        with open(path, "rb") as f:
            variables = flax.serialization.from_bytes(
                variables, f.read())
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        print(f"# weights: {path}")
    predictor = predictor_from(model, variables)
    obj, mask = make_car_object(300, 200, seed=0)

    base = PhysObjAttackConfig(
        obj_h=200, obj_w=300,
        dist_range=tuple(float(x) for x in EVAL_DIST_RANGE),
        scene_h=H, scene_w=W, ori_h=ORI_H, ori_w=ORI_W)

    def predict_scale(s):
        def fn(v, images):
            _, outs = model.apply(v, images, train=False,
                                  method="features_and_disps")
            return outs[("disp", s)]
        return fn

    results = {}
    import sys
    subset = sys.argv[1:] or None
    for crop_w, crop_h, scale, fine, view in (
            (None, None, 0, 0, "float32"),
            (512, None, 0, 0, "float32"), (512, 256, 0, 0, "float32"),
            (320, 256, 0, 0, "float32"),
            (384, 256, 0, 0, "float32"), (384, 256, 1, 0, "float32"),
            (384, 256, 1, 1, "float32"), (384, 256, 2, 0, "float32"),
            (384, 256, 2, 1, "float32"), (384, 256, 2, 2, "float32"),
            (384, 256, 0, 0, "bfloat16"),
            (320, 256, 0, 0, "bfloat16"),
            (320, 256, 1, 1, "bfloat16"),
            (320, 256, 1, 2, "bfloat16"),
            (448, 288, 0, 0, "bfloat16"),
            (384, 288, 0, 0, "bfloat16")):
        crop = (f"{crop_w}x{crop_h}"
                + (f"s{scale}f{fine}" if scale else "")
                + ("bf16" if view == "bfloat16" else ""))
        if subset and crop not in subset:
            continue
        cfg = dataclasses.replace(base, attack_crop_w=crop_w,
                                  attack_crop_h=crop_h,
                                  attack_scale=scale,
                                  attack_scale_fine_steps=fine,
                                  attack_view_dtype=view)
        atk = PGDObjectAttack(predictor.apply_fn, jnp.asarray(obj),
                              jnp.asarray(mask), cfg,
                              eps=0.1, alpha=0.005, steps=10)
        if scale:
            atk.predict_scale_fn = predict_scale(scale)
        rows = []
        for i in range(N_SCENES):
            scene = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=10 + i))
            key = jax.random.fold_in(jax.random.PRNGKey(17), i)
            adv, ben, masks, _ = atk(predictor.variables, scene, BATCH,
                                     key, eval_mode=True)
            errs = _batch_metrics(predictor, adv, ben, masks)
            rows.append(np.asarray(jnp.stack(errs)))
        rows = np.stack(rows)
        results[crop] = dict(zip(METRIC_NAMES,
                                 rows.mean(axis=0).tolist()))

    print(json.dumps(results, indent=2))
    if "NonexNone" not in results:
        return  # subset run without the full-frame baseline
    full = results["NonexNone"]
    cols = [k for k in results if k != "NonexNone"]
    print("\n| metric | full-frame | " +
          " | ".join(f"crop {c}" for c in cols) + " |")
    print("|---" * (2 + len(cols)) + "|")
    for k in METRIC_NAMES:
        vals = " | ".join(
            f"{results[c][k]:.4f} ({results[c][k]/full[k]:.2f}x)"
            if full[k] else "nan" for c in cols)
        print(f"| {k} | {full[k]:.4f} | {vals} |")


if __name__ == "__main__":
    main()
