"""Profile the distill train step (or decoder-only) on the TPU and
print the top ops by total device time, parsed from the TraceViewer
JSON that jax.profiler writes.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_step.py [decoder|step]
"""

import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 32
H, W = 320, 1024
ORI_H, ORI_W = 375, 1242
DT = jnp.bfloat16


def prof_decoder(tmpdir):
    from depthmodelhardening_tpu.models.resnet import ResnetEncoder
    from depthmodelhardening_tpu.models.depth_decoder import DepthDecoder

    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), DT)
    enc = ResnetEncoder(num_layers=18, dtype=DT)
    v_enc = enc.init(jax.random.PRNGKey(1), x[:1], train=False)
    feats = jax.jit(lambda v, x: enc.apply(v, x, train=False))(v_enc, x)
    feats = [jax.lax.stop_gradient(f) for f in feats]

    dec = DepthDecoder(dtype=DT, wpacked=True)
    v = dec.init(jax.random.PRNGKey(2), [f[:1] for f in feats])

    def loss(v, feats):
        outs = dec.apply(v, feats)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in outs.values())

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    out = g(v, feats)
    _sync(out)
    with jax.profiler.trace(tmpdir):
        for _ in range(3):
            out = g(v, feats)
        _sync(out)


def prof_train_step(tmpdir):
    from depthmodelhardening_tpu.data.synthetic import (
        make_car_object, make_scene,
    )
    from depthmodelhardening_tpu.models.wrappers import (
        init_monodepth2, predictor_from,
    )
    from depthmodelhardening_tpu.training.config import DistillConfig
    from depthmodelhardening_tpu.training.distill import DistillTrainer

    teacher_model, teacher_vars = init_monodepth2(
        jax.random.PRNGKey(0), H, W, dtype=DT, scales=(0,), fold_bn=True,
        wpack_stem8=True, wpack_decoder=True)
    teacher = predictor_from(teacher_model, teacher_vars)
    obj, mask = make_car_object(300, 200, seed=0)
    cfg = DistillConfig(adv_type="object", epsilon=0.1, alpha=0.005,
                        steps=10, batch_size=B, scene_h=H, scene_w=W,
                        ori_h=ORI_H, ori_w=ORI_W,
                        compute_dtype="bfloat16",
                        attack_crop_w=320, attack_crop_h=256,
                        # keep identical to bench.py so the persistent
                        # compilation cache is shared
                        attack_view_dtype="bfloat16",
                        wpack_stem8=True, wpack_decoder=True)
    trainer = DistillTrainer(cfg, jax.random.PRNGKey(1), obj, mask,
                             teacher)
    state = trainer.make_state()
    scenes = jnp.asarray(make_scene(1, ORI_H, ORI_W, seed=2))
    for i in range(2):
        state, metrics = trainer.train_step(state, scenes,
                                            jax.random.PRNGKey(10 + i))
    float(metrics["loss"])
    with jax.profiler.trace(tmpdir):
        state, metrics = trainer.train_step(state, scenes,
                                            jax.random.PRNGKey(99))
        float(metrics["loss"])


def _sync(out):
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def report_opstats(tmpdir, top=35):
    """Aggregate by framework op via xprof (falls back to raw trace)."""
    paths = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return False
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        try:
            from tensorboard_plugin_profile.convert import (
                raw_to_tool_data,
            )
        except ImportError:
            return False
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tab = json.loads(data)
    if isinstance(tab, list):
        tab = tab[0]
    if not (isinstance(tab, dict) and "rows" in tab):
        return False
    labels = [c.get("label") or c.get("id") for c in tab["cols"]]
    rows = [[c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            for r in tab["rows"]]
    i_type = labels.index("Type") if "Type" in labels else None
    name_i = next(i for i, l in enumerate(labels)
                  if l and "peration" in str(l))
    self_i = next(i for i, l in enumerate(labels)
                  if l and "self" in str(l).lower()
                  and "time" in str(l).lower())
    dev = [r for r in rows if i_type is None or r[i_type] == "Device"]
    dev.sort(key=lambda r: -float(r[self_i] or 0))
    tot = sum(float(r[self_i] or 0) for r in dev)
    print(f"total device self-time: {tot/1e3:.2f} ms")
    for r in dev[:top]:
        print(f"{float(r[self_i])/1e3:9.3f} ms  {str(r[name_i])[:100]}")
    return True


def report(tmpdir, top=40):
    paths = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("NO TRACE FILES under", tmpdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # keep only device-lane complete events with durations
    totals = {}
    counts = {}
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        totals[name] = totals.get(name, 0) + ev["dur"]
        counts[name] = counts.get(name, 0) + 1
    items = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    width = max(len(n[:70]) for n, _ in items)
    print(f"{'op':{width}}  total_ms  count")
    for name, dur in items:
        print(f"{name[:70]:{width}}  {dur/1000:8.2f}  {counts[name]:5d}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "step"
    tmpdir = f"/tmp/jaxprof_{which}_{int(time.time())}"
    if which == "decoder":
        prof_decoder(tmpdir)
    else:
        prof_train_step(tmpdir)
    if not report_opstats(tmpdir):
        report(tmpdir)


if __name__ == "__main__":
    main()
