"""Capture a jax.profiler trace of the model passes and print the
top-k HLO ops by self time (via xprof/tensorboard_plugin_profile).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/trace_step.py [what]
  what in {teacher, igrad, pgrad, attack} (default teacher)
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

from depthmodelhardening_tpu.models.wrappers import init_monodepth2

B = 32
LOGDIR = "/tmp/jaxtrace"


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                         .astype(jnp.float32)))


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "teacher"
    H, W = (320, 1024) if what != "igrad_crop" else (256, 384)
    model, variables = init_monodepth2(
        jax.random.PRNGKey(0), H, W, dtype=jnp.bfloat16, scales=(0,),
        s2d_stem=True, wpack_decoder=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                          jnp.bfloat16)

    if what == "teacher":
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    elif what in ("igrad", "igrad_crop"):
        fn = jax.jit(jax.grad(
            lambda x, v: jnp.mean(model.apply(v, x, train=False)
                                  .astype(jnp.float32)), argnums=0))
        fn = (lambda f: (lambda v, x: f(x, v)))(fn)
    elif what == "pgrad":
        fn = jax.jit(jax.grad(
            lambda v, x: jnp.mean(model.apply(v, x, train=False)
                                  .astype(jnp.float32)), argnums=0))
    else:
        raise SystemExit(f"unknown: {what}")

    _sync(fn(variables, x))  # compile
    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            out = fn(variables, x)
        _sync(out)

    # locate the xplane file and convert to op_profile
    paths = glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        return
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tab = json.loads(data)
    if isinstance(tab, list):
        tab = tab[0]
    # gviz DataTable: {"cols":[{"label":...}], "rows":[{"c":[{"v":..}]}]}
    if isinstance(tab, dict) and "rows" in tab:
        labels = [c.get("label") or c.get("id") for c in tab["cols"]]
        rows = [[c.get("v") if isinstance(c, dict) else c
                 for c in r["c"]] for r in tab["rows"]]
    else:
        print(json.dumps(tab, indent=1)[:2000])
        return
    print("columns:", labels, flush=True)
    try:
        i_type = labels.index("Type")
    except ValueError:
        i_type = None
    # find the columns for op name and total self time
    name_i = next(i for i, l in enumerate(labels)
                  if l and "peration" in str(l))
    self_i = next(i for i, l in enumerate(labels)
                  if l and "self" in str(l).lower()
                  and "time" in str(l).lower())
    dev = [r for r in rows if i_type is None or r[i_type] == "Device"]
    dev.sort(key=lambda r: -float(r[self_i] or 0))
    tot = sum(float(r[self_i] or 0) for r in dev)
    print(f"total device self-time: {tot/1e3:.2f} ms "
          f"(3 iterations)", flush=True)
    for r in dev[:25]:
        print(f"{float(r[self_i])/1e3:9.3f} ms  {r[name_i][:100]}",
              flush=True)


if __name__ == "__main__":
    main()
